package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch IVF-PQ soak (not part of the library): 500k synthetic 64-dim
  * vectors — index build cost, index size, probe latency, recall vs
  * brute force on the probed queries. */
object PqSoak {
  def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"SOAK $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").appName("pq-soak").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 500000
    val dim = 64
    // deterministic synthetic vectors with planted cluster structure:
    // 64 cluster centers from xxhash bits, vectors = center + hash noise
    val vecs = spark.range(n).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        ((pmod(xxhash64(pmod($"id", lit(64)), j), lit(1000)) - lit(500)).cast("double") / lit(250.0) +
          (pmod(xxhash64($"id", j), lit(1000)) - lit(500)).cast("double") / lit(2500.0)).cast("float"))
        .as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"SOAK corpus: ${vecs.count()} vectors, dim $dim")

    val ivf = t("ivf train (10k sample)") {
      graft.pipeline.IVF.train(vecs, "vec_id", "embedding", k = 64) }
    val pq = t("pq train (10k sample, m=16 ks=16)") {
      graft.pipeline.Pq.train(vecs, "vec_id", "embedding", m = 16, ks = 16) }
    val path = java.nio.file.Files.createTempDirectory("pq-soak").toString + "/idx"
    t("index build + cell-partitioned write (500k rows)") {
      graft.pipeline.Pq.saveIndex(vecs, "vec_id", "embedding", pq, ivf, path) }
    val bytes = {
      def size(f: java.io.File): Long =
        if (f.isFile) f.length else Option(f.listFiles).map(_.map(size).sum).getOrElse(0L)
      size(new java.io.File(path))
    }
    println(f"SOAK index size: ${bytes / 1024.0 / 1024.0}%.1f MiB for $n vectors " +
      f"(${bytes.toDouble / n}%.1f B/vec vs ${4 * dim} B/vec float32)")

    val qs = vecs.filter($"vec_id" < 20)
    val brute = t("brute-force twin (full 500k scan)") {
      graft.pipeline.Similarity.bruteForceTopK(vecs, qs, "vec_id", "embedding", 10)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    }
    for (rr <- Seq(50, 500, 2000, 8000)) {
      val got = t(s"probe 20 queries (nprobe=8, rerank=$rr, k=10)") {
        graft.pipeline.Pq.searchIndex(path, qs, "vec_id", "embedding", k = 10,
            pq, ivf, nprobe = 8, rerank = rr, rerankWith = Some(vecs))
          .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      }
      val recall = got.intersect(brute).size.toDouble / brute.size
      println(f"SOAK recall@10 rerank=$rr: $recall%.3f")
    }
    spark.stop()
  }
}
