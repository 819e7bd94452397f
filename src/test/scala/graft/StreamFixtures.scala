package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Shared file-stream fixture: write a DataFrame as ONE parquet file at
  * `dest` with a pinned mtime — the file-stream source orders batch
  * pick-up by modification time, so distinct mtimes make the micro-batch
  * sequence deterministic. THE single copy of the drop discipline for
  * every streamed-ingest/probe spec.
  */
object StreamFixtures {

  def oneFile(df: DataFrame, dest: String, mtime: Long): Unit = {
    val tmp = Files.createTempDirectory("graft_onefile_").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
    Files.createDirectories(Paths.get(dest).getParent)
    Files.move(part.toPath, Paths.get(dest))
    assert(new java.io.File(dest).setLastModified(mtime), s"could not set mtime on $dest")
  }
}
