package graft.ddl

import graft.schema.TableSchema

/** External-table DDL renderers (reference operators R9/R10 — create.py:76-96
  * and :99-154). Pure string rendering; text layout matches the reference's
  * templates byte-for-byte (golden-tested against the port of
  * tests/test_open_csv_serde_table_creator.py:12-45).
  */
object SpectrumDdl {

  /** Dots in the table name become underscores (create.py:91). */
  private def qualifiedName(schemaName: String, tableName: String): String =
    s"$schemaName.${tableName.replace('.', '_')}"

  /** Column list: `name TYPE`, joined exactly like the reference
    * (',\n    '.join — create.py:53). DOUBLE PRECISION is already rewritten
    * to FLOAT by the type ADT (create.py:11-13).
    */
  private def columnList(schema: TableSchema): String =
    schema.fields.map { case (n, t) => s"$n ${t.ddl}" }.mkString(",\n        ")

  /** `CREATE EXTERNAL TABLE ... STORED AS PARQUET` (create.py:77-83). */
  def parquetTable(schemaName: String, tableName: String, schema: TableSchema,
                   location: String): String =
    s"""
    create external table ${qualifiedName(schemaName, tableName)} (
        ${columnList(schema)}
    )
    stored as parquet
    location '$location'
    """

  /** `ROW FORMAT SERDE OpenCSVSerde` variant (create.py:99-154). */
  def openCsvSerdeTable(schemaName: String, tableName: String, schema: TableSchema,
                        location: String, delimiter: String = "|",
                        gzipped: Boolean = true): String = {
    val compression = if (gzipped) "gzip" else "none"
    s"""
    create external table ${qualifiedName(schemaName, tableName)} (
        ${columnList(schema)}
    )
    ROW FORMAT SERDE 'org.apache.hadoop.hive.serde2.OpenCSVSerde' WITH SERDEPROPERTIES (
        'separatorChar' = '$delimiter',
        'quoteChar' = '\\"',
        'escapeChar' = '\\\\'
    )
    stored as textfile
    location '$location'
    table properties (
        'compression_type'='$compression'
    );
    """
  }

  /** `ALTER TABLE ... ADD PARTITION` (reference R14,
    * examples/weekly_partitions.py:107-129).
    */
  def addPartition(schemaName: String, tableName: String, partitionKey: String,
                   partitionValue: String, location: String): String =
    s"""
    alter table ${qualifiedName(schemaName, tableName)}
    add partition ($partitionKey='$partitionValue')
    location '$location'
    """
}
