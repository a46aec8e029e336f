package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** throwaway experiment driver — not committed */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(Runtime.getRuntime.availableProcessors)
    import spark.implicits._
    val dir = args.lift(0).getOrElse("/tmp/mm_x300")
    val pl = spark.read.parquet(s"$dir/media.parquet")
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    val hashed = pl.mapPartitions(_.flatMap { case (id, bytes) =>
      val m = operators.Multimodal.decode(id, bytes)
      if (m.format == "png" || m.format == "jpeg")
        Some((id, operators.Multimodal.phash64(bytes)))
      else None
    }).toDF("doc_id", "simhash")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .localCheckpoint(false)
    println(s"[n] ${hashed.count()}")

    def layoutJoin(sizes: Array[Int], m: Int): Long = {
      val offs = sizes.scanLeft(0)(_ + _).init
      def block(i: Int): Column =
        shiftright(col("simhash"), offs(i)).bitwiseAND(lit((1L << sizes(i)) - 1))
      val nb = sizes.length
      val combos = (0 until nb).combinations(m).toSeq
      val keyed = hashed.select(col("doc_id"), col("simhash"),
          explode(array(combos.zipWithIndex.map { case (cs, c) =>
            struct(lit(c).as("cb"),
              cs.map(block).reduce((a, b) => a * lit(1L << 7) + b).as("bkey"))
          }: _*)).as("k"))
        .select(col("doc_id"), col("simhash"), col("k.cb"), col("k.bkey"))
      val xorCol = col("x.simhash").bitwiseXOR(col("y.simhash"))
      keyed.as("x").hint("shuffle_merge").join(keyed.as("y").hint("shuffle_merge"),
          col("x.cb") === col("y.cb") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
        .filter(bit_count(xorCol) <= 8)
        .count()
    }
    def time(tag: String)(f: => Long): Unit =
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        val c = f
        println(f"[$tag] run=$r ${(System.nanoTime() - t0) / 1e9}%.1f s rows=$c")
      }
    time("layout-10x2") { layoutJoin(Array(7, 7, 7, 7, 6, 6, 6, 6, 6, 6), 2) }
    time("layout-12x4") { layoutJoin(Array(6, 6, 6, 6, 5, 5, 5, 5, 5, 5, 5, 5), 4) }
    time("layout-11x3") { layoutJoin(Array(6, 6, 6, 6, 6, 6, 6, 6, 6, 5, 5), 3) }
    spark.stop()
  }
}
