package graft

import org.apache.spark.sql.functions._

/** Synthetic documents/embeddings generator for SCALE-STRESS runs
  * beyond the driver-shipped SFs (the sf1 question: do the dedup/ANN
  * operators scale ~linearly where the 100 TB design says they
  * should?). Mirrors the driver corpus's statistical family measured
  * at sf0.1 — word-salad texts of 40..70 tokens, 20 sources, 5 langs,
  * planted exact-dup and near-dup groups, 64-dim embeddings in 10
  * Gaussian clusters with planted high-cosine twins — with the VOCAB
  * scaled ∝ n^(1/3) so per-shingle document frequency (the quantity
  * DfCap bounds) stays roughly constant as the corpus grows; without
  * that, a fixed 31-word vocab at 10× pushes most shingles over the
  * cap and the inverted index trivially empties, which measures
  * nothing.
  *
  * Deterministic: every row derives from a hash-seeded RNG on its id,
  * so reruns and partitionings produce identical bytes.
  *
  * usage: runMain graft.GenData <outDir> <nDocs> <nVecs>
  */
object GenData {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val nDocs = args(1).toInt
    val nVecs = args(2).toInt
    val spark = GraftSession.local(Runtime.getRuntime.availableProcessors)
    import spark.implicits._

    val vocabN = math.max(31, (31 * math.cbrt(nDocs / 5000.0)).round.toInt)
    val vocab = Array.tabulate(vocabN)(i => s"w$i")
    val langs = Array("en", "de", "fr", "es", "ja")

    def docText(rnd: scala.util.Random): String = {
      val n = 40 + rnd.nextInt(31)
      Array.fill(n)(vocab(rnd.nextInt(vocabN))).mkString(" ")
    }
    val docs = spark.range(nDocs.toLong).repartition(64).map { jid =>
      val id: Long = jid
      // exact dups: id % 625 == 1 copies id-1; near-dups: id % 500 == 3
      // rewrites ~10% of id-1's tokens (jaccard lands around the 0.6 gate)
      def seeded(i: Long) = new scala.util.Random(i * 2654435761L + 17)
      val rnd = seeded(id)
      val text =
        if (id % 625 == 1 && id > 0) docText(seeded(id - 1))
        else if (id % 500 == 3 && id > 0) {
          val base = docText(seeded(id - 1)).split(' ')
          base.map(t => if (rnd.nextInt(10) == 0) vocab(rnd.nextInt(vocabN)) else t)
            .mkString(" ")
        } else docText(rnd)
      (id, text, langs(rnd.nextInt(langs.length)), s"src${rnd.nextInt(20)}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$out/documents.parquet")

    val dim = 64
    val vecs = spark.range(nVecs.toLong).repartition(64).map { jid =>
      val id: Long = jid
      def gauss(seed: Long) = {
        val r = new scala.util.Random(seed * 0x9e3779b97f4a7c15L + 3)
        Array.fill(dim)(r.nextGaussian())
      }
      val base = if (id % 143 == 1 && id > 0) id - 1 else id // planted twin pair
      val label = (base % 10).toInt // twin shares its base's cluster
      val cent = gauss(1000 + label)
      val noise = gauss(7000 + base)
      val twin = if (id % 143 == 1 && id > 0) gauss(9000 + id).map(_ * 0.15) else new Array[Double](dim)
      val v = Array.tabulate(dim)(i => (0.3 * cent(i) + 0.25 * noise(i) + twin(i)).toFloat)
      (id, v.toSeq, label)
    }.toDF("vec_id", "embedding", "label")
    vecs.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"[gen] $out docs=$nDocs vecs=$nVecs vocab=$vocabN")
    spark.stop()
  }
}
