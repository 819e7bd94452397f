package graft.tools
import org.apache.spark.sql.functions._
object DupProfile {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.engine.Sessions.local()
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $n%-18s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warm the memoized index
    t("warm-full")(graft.SparkEntry.queries("d_dup_clusters")(spark, dir).write.format("noop").mode("overwrite").save())
    (1 to 3).foreach { i =>
      t(s"full-$i")(graft.SparkEntry.queries("d_dup_clusters")(spark, dir).write.format("noop").mode("overwrite").save())
    }
    val pairs = graft.queries.NorthStar.storedSimhashPairs(spark, dir)
    (1 to 2).foreach { i => t(s"pairfeed-$i")(pairs.write.format("noop").mode("overwrite").save()) }
    (1 to 2).foreach { i =>
      t(s"cc-$i")(graft.operators.ConnectedComponents.label(pairs)._1.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
