package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe — deleted before commit. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      println(s"== $sf emb=${emb.count()} docs=${docs.count()}")

      // minhash lsh vs exact jaccard at 0.5
      val exactJ = graft.pipeline.Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val mh = graft.pipeline.Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      println(s"$sf minhash: exact=${exactJ.size} lsh=${mh.size} hit=${mh.intersect(exactJ).size} subset=${mh.subsetOf(exactJ)}")

      // simhash vs brute force hamming<=3
      val hashed = docs.select($"doc_id",
        graft.pipeline.Dedup.simhash64(graft.pipeline.TextAnalysis.tokens($"text")).as("sh"))
      val bf = hashed.as("a").join(hashed.as("b"), $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
          bit_count($"a.sh".bitwiseXOR($"b.sh")).as("h"))
        .filter($"h" <= 3).select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val sh = graft.pipeline.Dedup.simhashPairs(docs, "doc_id", "text", 3)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      println(s"$sf simhash: brute=${bf.size} blocked=${sh.size} equal=${bf == sh}")

      // ann lsh vs brute, driver-query params (20 queries, k=10, defaults)
      val qs = emb.filter($"vec_id" < 20)
      val brute = graft.pipeline.Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val lsh = graft.pipeline.Similarity.lshTopK(emb, qs, "vec_id", "embedding", 10, dim = 64)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val lshR = brute.keys.map(q => lsh.getOrElse(q, Set.empty[Long]).intersect(brute(q)).size.toDouble / brute(q).size)
      println(f"$sf ann_lsh: avg_recall=${lshR.sum / lshR.size}%.3f min=${lshR.min}%.3f")

      // ann ivf vs brute, driver-query params k=16 nprobe=4
      val model = graft.pipeline.IVF.train(emb, "vec_id", "embedding", k = 16)
      val ivf = graft.pipeline.IVF.topK(emb, qs, "vec_id", "embedding", 10, model, nprobe = 4)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val ivfR = brute.keys.map(q => ivf.getOrElse(q, Set.empty[Long]).intersect(brute(q)).size.toDouble / brute(q).size)
      println(f"$sf ann_ivf: avg_recall=${ivfR.sum / ivfR.size}%.3f min=${ivfR.min}%.3f")

      // lsh near-dup pairs, chosen params 4x16
      val exactP = graft.pipeline.Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 50)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val lshP = graft.pipeline.Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 50,
        dim = 64, bitsPerTable = 4, tables = 16)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      println(s"$sf neardup 4x16: hit=${lshP.intersect(exactP).size}/50")
    }
    spark.stop()
  }
}
