package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Hash primitives shared, value-for-value, between the engine and the DuckDB
  * oracle.
  *
  * The round-1 hash operators (SimHash, fingerprinting, hyperplane LSH) were
  * built on Spark's xxhash64, which DuckDB does not implement — so they could
  * only get rows-only checks. md5 exists in both engines (identical lowercase
  * hex over utf-8 bytes), and hex digits decode with plain shared SQL
  * (`instr('0123456789abcdef', substring(h, p, 1)) - 1`), so every derived
  * quantity below is differentially checkable:
  *
  *  - token/sample hashes: `md5(s)` directly;
  *  - hash bits (SimHash): bit i of the 128-bit md5 = bit (i%4) of hex digit
  *    (i div 4);
  *  - pseudo-random hyperplanes (cosine LSH): plane(j,d) =
  *    hex4(md5(j || '_' || d)) / 65535 - 0.5, where hex4 is the first four
  *    hex digits as an integer in [0, 65535].
  *
  * Note this is NOT what you'd pick for raw 100 TB throughput — xxhash64 is
  * ~10x faster than md5 — but hash cost is a constant factor on a per-row,
  * perfectly-parallel map; the asymptotics (banding, bucket joins) are
  * unchanged, and differential verifiability is worth the constant.
  */
object SharedHash {

  val HexDigits = "0123456789abcdef"

  /** Lowercase-hex md5, identical to Spark's `md5()` and DuckDB's `md5()`. */
  def md5Hex(bytes: Array[Byte]): String = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(HexDigits.charAt((b >> 4) & 0xf)).append(HexDigits.charAt(b & 0xf)))
    sb.toString
  }

  def md5Hex(s: String): String = md5Hex(s.getBytes(StandardCharsets.UTF_8))

  /** Value of the hex digit at 1-based position `pos1` of hex string `h` —
    * as a SQL fragment valid in both Spark SQL and DuckDB.
    */
  def digitSql(h: String, pos1: String): String =
    s"(instr('$HexDigits', substring($h, $pos1, 1)) - 1)"

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5]:
    * plane(j, d) = hex4(md5("j_d")) / 65535 - 0.5. The DuckDB twin recomputes
    * it from md5 in SQL (see the s_ann_lsh / d_embed_neardup_lsh oracles);
    * this Scala version feeds the Spark side as a folded literal matrix so
    * each row pays 0 hashes (the 4096 md5 calls happen once, on the driver).
    */
  def planeValue(j: Int, d: Int): Double = {
    val h = md5Hex(s"${j}_${d}")
    def hv(i: Int): Int = HexDigits.indexOf(h.charAt(i))
    val hex4 = hv(0) * 4096 + hv(1) * 256 + hv(2) * 16 + hv(3)
    hex4.toDouble / 65535.0 - 0.5
  }

  /** nBits x dim hyperplane matrix (row j = plane j). */
  def planes(nBits: Int, dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(nBits)(j => Seq.tabulate(dim)(d => planeValue(j, d)))

  /** DuckDB CTE computing the same planes table as [[planes]]:
    * columns (j, d, p) for j in [0, nBits), d in [0, dim).
    */
  def planesOracleCte(nBits: Int, dim: Int): String = {
    val m = s"md5(j.j || '_' || d.d)"
    s"""SELECT j.j AS j, d.d AS d,
       |       CAST(${digitSql(m, "1")} * 4096 + ${digitSql(m, "2")} * 256 +
       |            ${digitSql(m, "3")} * 16 + ${digitSql(m, "4")} AS DOUBLE) / 65535.0 - 0.5 AS p
       |FROM (SELECT unnest(range(0, $nBits)) AS j) j,
       |     (SELECT unnest(range(0, $dim)) AS d) d""".stripMargin
  }
}
