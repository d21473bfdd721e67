package graft

import org.apache.spark.sql.functions._

/** TEMPORARY stage-timing harness for the winnow plan at scale — not part
  * of the engine; deleted after the profiling session. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/sf10")
    val spark = Tables.session("scratch", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](name: String)(f: => T): T = {
      val s = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - s) / 1e9}%.1f s"); r
    }
    val k = 8; val w = 4
    val docs = Tables.load(spark, dir, "documents")
    val norm = lower(concat_ws(" ", graft.operators.Texty.tokens(col("text"))))
    val d = docs.select(col("doc_id"), norm.as("nt"))
      .withColumn("ng", length(col("nt")) - lit(k - 1))
      .filter(col("ng") >= w)
      .repartition(col("doc_id"))
      .transform(graft.Caches.cached(_))
    t("cache d (tokenize)") { d.count() }
    val grams = d.select(col("doc_id"), col("ng"),
      posexplode(expr(s"transform(sequence(1, length(nt) - ${k - 1})," +
        s" i -> substring(nt, i, $k))")).as(Seq("pos0", "gram")))
    val hashed = grams.select(col("doc_id"), col("ng"), col("pos0"),
      graft.operators.Texty.baseHash60(col("gram")).as("h"))
    t("explode+md5 only (count)") { hashed.count() }
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos0").rowsBetween(0, w - 1)
    val mins = hashed.withColumn("mn", min(col("h")).over(win))
      .filter(col("pos0") <= col("ng") - w)
      .select(col("doc_id"), col("mn").as("fingerprint"))
    t("window minima (count)") { mins.count() }
    val dis = mins.distinct()
    t("+distinct (count)") { dis.count() }
    t("+orderBy (count via sort)") { dis.orderBy("doc_id", "fingerprint").count() }
    graft.Caches.release()
    spark.stop()
  }
}
