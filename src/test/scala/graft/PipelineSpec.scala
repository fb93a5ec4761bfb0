package graft

import graft.pipeline.{Clustering, Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("wordShingles produces n-2 distinct trigram shingles") {
    val out = Seq("a b c d e", "a b", "x x x x")
      .toDF("text").select(TextAnalysis.wordShingles($"text").as("s"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d", "c d e"))
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq("x x x")) // distinct collapses repeats
  }

  test("languageId picks deterministic argmax with priority ties") {
    val out = Seq("the cat and the dog", "le chat et le chien de la maison",
      "xyz qqq").toDF("text")
      .select(TextAnalysis.languageId($"text")).as[String].collect()
    assert(out === Array("en", "fr", "und"))
  }

  test("chunkTokens: overlapping windows vs a plain-Scala reference; guards") {
    /** Reference chunking: the same start/width contract on collections. */
    def ref(text: String, width: Int, stride: Int): Seq[(Long, Long, String)] = {
      val toks = text.trim.split("\\s+", -1).toSeq
      (0 to (toks.length - 1) / stride).map { k =>
        val c = toks.slice(k * stride, k * stride + width)
        (k.toLong, c.length.toLong, c.mkString(" "))
      }
    }
    val samples = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens: full + shortening tails
      (2L, "one two three"),       // shorter than width
      (3L, ""),                    // the [""]-token quirk: one empty chunk
      (4L, "x y z w v u t s r q p o n m")) // 14 tokens
    for ((w, st) <- Seq((4, 2), (8, 3), (5, 5), (3, 1))) {
      val got = graft.pipeline.TextAnalysis.chunkTokens(
        samples.toDF("doc_id", "text"), "doc_id", "text", w, st)
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq).toMap
      samples.foreach { case (id, text) =>
        assert(got(id) === ref(text, w, st), s"doc $id width=$w stride=$st")
      }
    }
    // stride == width degenerates to disjoint windows covering every token
    val disjoint = graft.pipeline.TextAnalysis.chunkTokens(
      samples.toDF("doc_id", "text"), "doc_id", "text", 5, 5)
      .groupBy("doc_id").agg(sum("n_chunk_tokens").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(disjoint(1L) === 10L && disjoint(4L) === 14L)
    intercept[IllegalArgumentException](
      graft.pipeline.TextAnalysis.chunkTokens(
        samples.toDF("doc_id", "text"), "doc_id", "text", 4, 5))
    intercept[IllegalArgumentException](
      graft.pipeline.TextAnalysis.chunkTokens(
        samples.toDF("doc_id", "text"), "doc_id", "text", 0, 1))
  }

  test("corpusReport: datasheet metrics vs a plain-Scala reference; empty corpus") {
    val rows = Seq(
      (1L, "the cat and the dog is of to"),
      (2L, "THE  cat and the dog is of to"), // dup of 1 modulo case/spacing
      (3L, "le chat et la les de"),
      (4L, ""),
      (5L, "reach me a@b.co and c@d.org now"),
      (6L, null: String)) // counts as an empty doc, not a metric ghost
    val got = TextAnalysis.corpusReport(rows.toDF("doc_id", "text"), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val texts = rows.map(r => Option(r._2).getOrElse(""))
    assert(got("docs_total") === 6L)
    assert(got("chars_total") === texts.map(_.length.toLong).sum)
    // the split-on-empty quirk: "" tokenizes to [""], size 1 — both engines
    assert(got("tokens_total") ===
      texts.map(_.trim.split("\\s+").length.toLong).sum)
    assert(got("fingerprints_distinct") === 4L) // 1=2 and 4=6 share
    assert(got("docs_exact_dup") === 2L)
    assert(got("docs_empty") === 2L)
    assert(got("pii_email_hits") === 2L)
    assert(got("lang_en") === 3L && got("lang_fr") === 1L &&
      got("lang_und") === 2L && got("lang_es") === 0L && got("lang_de") === 0L)
    assert(got.keySet.size === 12)

    val empty = TextAnalysis.corpusReport(
      rows.toDF("doc_id", "text").limit(0), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(empty.keySet === got.keySet)
    assert(empty.values.forall(_ === 0L), s"empty corpus card must be all zero: $empty")
  }

  test("MinHashSignature expression is bit-identical to the composed hash chain") {
    // the LSH banding (and therefore the driver's exact-equality oracle)
    // depends on the native single-pass signature producing EXACTLY the
    // values of the built-in spelling it replaced
    val sh = docs.select(TextAnalysis.wordShingles($"text").as("sh"))
      .filter(size($"sh") > 0).limit(100)
    val composed = sh.select(array((0 until 32).map { i =>
      array_min(transform($"sh", s => xxhash64(s, lit(42L), lit(i))))
    }: _*).as("sig")).as[Seq[Long]].collect().toSeq
    val native = sh.select(Dedup.minhashSignature($"sh", 32).as("sig"))
      .as[Seq[Long]].collect().toSeq
    assert(native === composed)
  }

  test("minhash LSH finds every high-jaccard pair the exact scan finds (recall)") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    // LSH verifies candidates with exact jaccard, so lsh ⊆ exact always:
    assert(lsh.subsetOf(exact))
    // and with 8 bands x 4 rows at j >= 0.7 collision prob ~0.97/pair:
    assert(lsh.size >= exact.size * 8 / 10,
      s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("simhash near-dup pairs: exact dups collide at distance 0") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content about spark query engines at scale"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(d, "doc_id", "text", maxDist = 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.head._3 === 0)
  }

  test("lsh ANN recall vs brute force") {
    val queries = emb.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 10, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.keys.map { q =>
      lsh.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / brute(q).size
    }.toSeq
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.5, s"avg LSH recall $avg too low") // 8 tables x 4 bits on random data
  }

  test("IVF ANN recall vs brute force, and determinism across retrains") {
    val queries = emb.filter($"vec_id" < 10)
    val model = graft.pipeline.IVF.train(emb, "vec_id", "embedding", k = 8)
    val model2 = graft.pipeline.IVF.train(emb, "vec_id", "embedding", k = 8)
    assert(model.centroids.map(_.toSeq).toSeq === model2.centroids.map(_.toSeq).toSeq,
      "training must be deterministic")
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = graft.pipeline.IVF.topK(emb, queries, "vec_id", "embedding", 10, model, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.keys.map { q =>
      ivf.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / brute(q).size
    }.toSeq
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.4, s"avg IVF recall $avg too low") // 3/8 cells probed on random data
  }

  test("TopKAgg returns k best with deterministic tie-break, matches sort") {
    val df = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.7))
      .toDF("id", "score")
    val top = df.agg(Similarity.topkByScore($"id", $"score", 3).as("t"))
      .select(explode($"t").as("r")).select($"r.id", $"r.score")
      .as[(Long, Double)].collect().toSeq
    assert(top === Seq((2L, 0.9), (3L, 0.9), (5L, 0.7)))
  }

  test("TopKAgg is partition-order independent") {
    val df = spark.range(0, 10000)
      .select($"id", (rand(7) * 100).as("score"))
      .cache()
    val a = df.repartition(1)
      .agg(Similarity.topkByScore($"id", $"score", 20)).collect().head
    val b = df.repartition(13)
      .agg(Similarity.topkByScore($"id", $"score", 20)).collect().head
    assert(a === b)
  }

  test("cosineSim matches manual computation and handles zero vectors") {
    val out = Seq(
      (Array(1.0f, 0f, 0f), Array(1.0f, 0f, 0f)),
      (Array(1.0f, 0f, 0f), Array(0f, 1.0f, 0f)),
      (Array(0f, 0f, 0f), Array(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b").select(Similarity.cosineSim($"a", $"b"))
      .as[Double].collect()
    assert(out(0) === 1.0 && out(1) === 0.0 && out(2) === 0.0)
  }

  test("multimodal decode pipeline: schema, determinism, frame explode shape") {
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val meta = Multimodal.decodeMeta(media)
    assert(meta.count() === docs.count())
    val m = meta.filter($"modality" === "video").head()
    assert(m.n_frames >= 1 && m.n_frames <= 8)
    val frames = Multimodal.sampleFrames(media)
    val counts = frames.groupBy("media_id").count()
      .withColumnRenamed("media_id", "fid")
    val byDoc = counts
      .join(meta.toDF(), counts("fid") === col("media_id"))
      .filter($"count" =!= $"n_frames").count()
    assert(byDoc === 0, "every video must emit exactly n_frames frames")
  }

  test("real image tier: javax.imageio decode, dHash locality, corrupt-payload safety") {
    def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, pix(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // a left-to-right gradient, the same gradient with one corner blotch,
    // and its inverse — plus a payload no codec accepts
    val grad = png(32, 24)((x, _) => { val v = x * 8 % 256; (v << 16) | (v << 8) | v })
    val gradBlotch = png(32, 24)((x, y) =>
      if (x < 3 && y < 3) 0xFFFFFF
      else { val v = x * 8 % 256; (v << 16) | (v << 8) | v })
    val inverse = png(32, 24)((x, _) => { val v = 255 - x * 8 % 256; (v << 16) | (v << 8) | v })
    val junk = "definitely not an image".getBytes("UTF-8")

    val media = Seq(
      Multimodal.MediaFile(1L, "image", grad),
      Multimodal.MediaFile(2L, "image", gradBlotch),
      Multimodal.MediaFile(3L, "image", inverse),
      Multimodal.MediaFile(4L, "image", junk)).toDS()
    val got = Multimodal.imageMeta(media).collect().sortBy(_.media_id)

    assert(got.map(_.ok).toSeq === Seq(true, true, true, false))
    assert(got(0).width === 32 && got(0).height === 24)
    assert(got.map(_.dhash.isDefined).toSeq === Seq(true, true, true, false))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // near-identical images land within a few bits; opposite gradients far
    assert(ham(got(0).dhash.get, got(1).dhash.get) <= 6,
      s"blotched twin too far: ${ham(got(0).dhash.get, got(1).dhash.get)}")
    assert(ham(got(0).dhash.get, got(2).dhash.get) >= 20,
      s"inverse gradient too close: ${ham(got(0).dhash.get, got(2).dhash.get)}")
    // deterministic across invocations (no rendering-hint variance)
    assert(Multimodal.imageDHash(grad) === Multimodal.imageDHash(grad))
    assert(Multimodal.decodeImageDims(junk) === None)

    // end-to-end: dHash + the shared pigeonhole pair scan finds the
    // blotched twin, skips the inverse, and ignores the undecodable row
    val pairs = Multimodal.imageNearDupPairs(media, maxDist = 6)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containmentPairs catches a doc embedded in a larger one; Jaccard misses it") {
    // d2 is d1 plus 4x unrelated padding: containment(d1 in d2) = 1.0 but
    // Jaccard ~ 0.2 — below any sensible Jaccard bar
    val core = (1 to 10).map(i => s"c$i").mkString(" ")
    val pad = (1 to 40).map(i => s"p$i").mkString(" ")
    val df = Seq(
      (1L, core),
      (2L, s"$core $pad"),
      (3L, "totally different words here and more and more of them")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(cont.length === 1)
    assert(cont.head._1 === 1L && cont.head._2 === 2L,
      "the smaller doc must come first")
    assert(cont.head._3 >= 0.99)
    val jac = Dedup.jaccardPairs(df, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(jac.isEmpty, "symmetric Jaccard structurally misses the inclusion")
    // equal-size exact dups keep id order
    val eq = Seq((5L, core), (4L, core)).toDF("doc_id", "text")
    val p = Dedup.containmentPairs(eq, "doc_id", "text", threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(p.toSeq === Seq((4L, 5L, 1.0)))
  }

  test("real audio tier: javax.sound decode, envelope-hash locality, corrupt safety") {
    val base = Multimodal.syntheticWav(3, 0)
    val twin = Multimodal.syntheticWav(3, 1)   // gain 0.8 + jitter: near-dup
    val far = Multimodal.syntheticWav(3, 2)    // different envelope
    val junk = "definitely not audio".getBytes("UTF-8")

    // header facts parse without PCM decode
    assert(Multimodal.decodeAudioFormat(base) === Some((8000L, 1L, 4160L)))
    assert(Multimodal.decodeAudioFormat(junk) === None)

    val media = Seq(
      Multimodal.MediaFile(1L, "audio", base),
      Multimodal.MediaFile(2L, "audio", twin),
      Multimodal.MediaFile(3L, "audio", far),
      Multimodal.MediaFile(4L, "audio", junk)).toDS()
    val got = Multimodal.audioMeta(media).collect().sortBy(_.media_id)
    assert(got.map(_.ok).toSeq === Seq(true, true, true, false))
    assert(got(0).sample_rate === 8000L && got(0).channels === 1L)
    assert(got(0).n_frames === 4160L && got(0).duration_ms === 520L)
    assert(got.map(_.fingerprint.isDefined).toSeq === Seq(true, true, true, false))

    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // the hash is gain-invariant, so the rescaled+jittered twin is close
    // and a different envelope is far
    assert(ham(got(0).fingerprint.get, got(1).fingerprint.get) <= 6,
      s"twin too far: ${ham(got(0).fingerprint.get, got(1).fingerprint.get)}")
    assert(ham(got(0).fingerprint.get, got(2).fingerprint.get) >= 15,
      s"foreign clip too close: ${ham(got(0).fingerprint.get, got(2).fingerprint.get)}")
    // deterministic across invocations
    assert(Multimodal.audioFingerprint(base) === Multimodal.audioFingerprint(base))

    // end-to-end through the shared pigeonhole pair scan
    val pairs = Multimodal.audioNearDupPairs(media, maxDist = 6)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("real video tier: RIFF/AVI parse, MJPEG decode, majority-hash locality, corrupt safety") {
    val base = Multimodal.syntheticAvi(4, 0)
    val twin = Multimodal.syntheticAvi(4, 1)   // per-frame corner blotch: near-dup
    val far = Multimodal.syntheticAvi(4, 2)    // inverted frames
    val junk = "definitely not a video".getBytes("UTF-8")

    // container facts parse without any frame decode
    assert(Multimodal.decodeVideoMeta(base) === Some((32L, 24L, 6L, 33333L)))
    assert(Multimodal.decodeVideoMeta(junk) === None)
    val refs = Multimodal.videoFrameRefs(base)
    assert(refs.length === 6)
    assert(refs.map(_.frame_idx).toSeq === (0L until 6L).toSeq)
    // every frame ref slices to a JPEG that the image tier decodes
    refs.foreach { r =>
      val jpeg = java.util.Arrays.copyOfRange(
        base, r.frame_offset.toInt, (r.frame_offset + r.frame_len).toInt)
      assert(Multimodal.decodeImageDims(jpeg) === Some((32L, 24L)))
    }

    val media = Seq(
      Multimodal.MediaFile(1L, "video", base),
      Multimodal.MediaFile(2L, "video", twin),
      Multimodal.MediaFile(3L, "video", far),
      Multimodal.MediaFile(4L, "video", junk)).toDS()
    val got = Multimodal.videoMeta(media).collect().sortBy(_.media_id)
    assert(got.map(_.ok).toSeq === Seq(true, true, true, false))
    assert(got(0).width === 32L && got(0).height === 24L)
    assert(got(0).n_frames === 6L && got(0).duration_ms === 199L) // 6 * 33333us
    assert(got.map(_.fingerprint.isDefined).toSeq === Seq(true, true, true, false))

    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(got(0).fingerprint.get, got(1).fingerprint.get) <= 6,
      s"blotched twin too far: ${ham(got(0).fingerprint.get, got(1).fingerprint.get)}")
    assert(ham(got(0).fingerprint.get, got(2).fingerprint.get) >= 20,
      s"inverted clip too close: ${ham(got(0).fingerprint.get, got(2).fingerprint.get)}")
    // deterministic across invocations
    assert(Multimodal.videoFingerprint(base) === Multimodal.videoFingerprint(base))

    // real frame sampling: one row per movi chunk with true byte offsets
    val frames = Multimodal.sampleVideoFrames(media)
      .as[(Long, Long, Long, Long)].collect()
    assert(frames.count(_._1 == 1L) === 6)
    assert(frames.forall { case (_, _, off, len) => off >= 0 && len > 0 })
    assert(!frames.exists(_._1 == 4L), "junk payload emits no frames")

    // end-to-end through the shared pigeonhole pair scan
    val pairs = Multimodal.videoNearDupPairs(media, maxDist = 6)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("removeContaminated drops only docs above the shared-shingle bar") {
    val test = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"), // 4 shared trigrams
      (2L, "alpha beta gamma unrelated words here"),   // 1 shared trigram
      (3L, "totally different text with nothing shared at all"))
      .toDF("doc_id", "text")
    def kept(bar: Long): Seq[Long] =
      Dedup.removeContaminated(train, test, "doc_id", "text", n = 3,
          maxSharedShingles = bar)
        .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept(0L) === Seq(3L), "any overlap flags at bar 0")
    assert(kept(3L) === Seq(2L, 3L), "doc 1's 4 shared trigrams exceed bar 3")
    assert(kept(10L) === Seq(1L, 2L, 3L), "high bar passes everything through")
    intercept[IllegalArgumentException](
      Dedup.removeContaminated(train, test, "doc_id", "text", 3, -1L))
    val clash = train.withColumn("__graft_contam_id", $"doc_id")
    val eC = intercept[IllegalArgumentException](
      Dedup.removeContaminated(clash, test, "doc_id", "text", 3, 0L))
    assert(eC.getMessage.contains("__graft_contam_id"))
  }

  test("normalizeText: NFC composition, control strip, ASCII fast path, SQL surface") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.expressions.NormalizeText
    def norm(s: String): String =
      NormalizeText.normalize(UTF8String.fromString(s)).toString

    // NFC: decomposed e + COMBINING ACUTE (U+0301) composes to U+00E9
    assert(norm("cafe\u0301") === "caf\u00e9")
    // control strip: C0 (except \t \n) and DEL go, \r\n collapses to \n
    assert(norm("ab\u0007\u007fcd") === "abcd")
    assert(norm("ab\r\ncd") === "ab\ncd")
    assert(norm("keep\tthis\nline") === "keep\tthis\nline")
    // idempotent
    assert(norm(norm("x\u0301\u0007")) === norm("x\u0301\u0007"))
    // ASCII fast path returns the INPUT BUFFER untouched (no allocation)
    val clean = UTF8String.fromString("plain ascii text\nwith lines\tand tabs")
    assert(NormalizeText.normalize(clean) eq clean)

    // DataFrame + codegen path, null passthrough
    val df = Seq((1L, Some("e\u0301!\u0008")), (2L, None))
      .toDF("id", "text")
      .select($"id", TextAnalysis.normalizeText($"text").as("t"))
      .orderBy($"id")
      .collect()
    assert(df(0).getString(1) === "\u00e9!")
    assert(df(1).isNullAt(1))

    // SQL registration
    TopnFunctions.register(spark)
    val viaSql = spark.sql("SELECT normalize_text('e\u0301x') AS t")
      .head.getString(0)
    assert(viaSql === "\u00e9x")
    // type check fails fast
    val e = intercept[Exception](
      spark.sql("SELECT normalize_text(42)").collect())
    assert(e.getMessage.contains("normalize_text requires STRING"))
  }

  test("htmlToText goldens: tags, blocks, skip-content, entities, whitespace") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.expressions.HtmlToText
    def x(s: String): String = HtmlToText.extract(UTF8String.fromString(s)).toString

    // inline tags vanish WITHOUT inserting space; block tags break lines
    assert(x("bo<b>ld</b> and <i>italic</i>") === "bold and italic")
    assert(x("<p>one</p><p>two</p>") === "one\ntwo")
    assert(x("a<br>b<BR/>c") === "a\nb\nc")
    assert(x("<ul><li>x</li><li>y</li></ul>") === "x\ny")
    // script/style/noscript/template content dropped, case-insensitive
    assert(x("a<script>var x = 1 < 2;</script>b") === "ab")
    assert(x("a<STYLE type='t'>p > span {}</STYLE>b") === "ab")
    assert(x("a<noscript>hidden</noscript>b") === "ab")
    // a close tag whose name merely STARTS with the open tag's name must
    // not terminate the block: everything until the MATCHING close tag
    assert(x("a<script>x</scripts>y</script>b") === "ab")
    assert(x("a<style>p {}</stylesheet>q</style>b") === "ab")
    // ...but whitespace/self-closing spellings of the real close tag do
    assert(x("a<script>x</script >b") === "ab")
    // unterminated script swallows through end-of-input
    assert(x("a<script>trailing junk") === "a")
    // comments, incl. tags inside them
    assert(x("a<!-- <p>not text</p> -->b") === "ab")
    assert(x("a<!-- unterminated") === "a")
    // entities: core named set + numeric dec/hex, decode ONCE (no re-scan),
    // unknown stays literal, nbsp -> plain space
    assert(x("A &amp; B &lt;tag&gt; &quot;q&quot; &apos;a&apos;") ===
      "A & B <tag> \"q\" 'a'")
    assert(x("&#65;&#x42;&#x1F600;") === "AB😀")
    assert(x("&amp;lt; stays") === "&lt; stays")
    assert(x("5 &foo; 7 & 8") === "5 &foo; 7 & 8")
    assert(x("no&nbsp;break") === "no break")
    // attributes, uppercase tags, tag-name prefixes do NOT match blocks
    assert(x("""<DIV CLASS="x">a</DIV>""") === "a")
    assert(x("<pre>a</pre>") === "a")
    assert(x("<param>p</param>q") === "pq") // 'param' is not the block 'p'
    // whitespace chain: collapse, trim around breaks, squeeze, strip ends
    assert(x("  <p>  a   b  </p>\t<p>c</p>  ") === "a b\nc")
    assert(x("<p></p><p></p>text<p></p>") === "text")
    // dangling '<' is tag junk through end-of-input
    assert(x("keep<") === "keep")

    // DataFrame + codegen path, null passthrough, SQL surface
    val df = Seq((1L, Some("<h1>T</h1><p>body &amp; soul</p>")), (2L, None))
      .toDF("id", "html")
      .select($"id", TextAnalysis.htmlToText($"html").as("t"))
      .orderBy($"id").collect()
    assert(df(0).getString(1) === "T\nbody & soul")
    assert(df(1).isNullAt(1))
    TopnFunctions.register(spark)
    assert(spark.sql("SELECT html_to_text('<p>a</p><p>b</p>') AS t")
      .head.getString(0) === "a\nb")
    val eH = intercept[Exception](
      spark.sql("SELECT html_to_text(42)").collect())
    assert(eH.getMessage.contains("html_to_text requires STRING"))
    // composes with the line-boilerplate front door: extraction output is
    // one line per block, exactly what explodeLines consumes
    val lines = graft.pipeline.Lines.explodeLines(
      Seq((7L, "<h1>Head</h1><p>para one</p><div>footer</div>"))
        .toDF("doc_id", "html")
        .select($"doc_id", TextAnalysis.htmlToText($"html").as("text")),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(lines === Set((7L, 0, "Head"), (7L, 1, "para one"), (7L, 2, "footer")))
  }

  test("htmlLinks goldens: quoting forms, order, boundaries, SQL surface") {
    def x(h: String): Seq[String] =
      Seq(h).toDF("html").select(TextAnalysis.htmlLinks($"html").as("l"))
        .as[Seq[String]].head()

    assert(x("""<a href="https://a.io/1">x</a><a href='b'>y</a><a href=c>z</a>""")
      === Seq("https://a.io/1", "b", "c"))
    // document order; first href in a tag wins; case/space tolerance
    assert(x("""<A HREF = "u1">a</A><a data-href="no" href="u2">b</a>""")
      === Seq("u1", "u2"))
    // anchors without (or with empty) href, and non-anchor tags, skipped
    assert(x("""<a name="top">t</a><a href="">e</a><area href="m"><p>p</p>""")
      === Seq.empty)
    // `<abbr>` is not an anchor; `<a` requires a whitespace boundary
    assert(x("""<abbr href="no">x</abbr><a href="yes">y</a>""") === Seq("yes"))
    // an unterminated anchor still yields a COMPLETED quoted value (the
    // scan runs through end-of-input); a quote spanning the tag's early
    // '>' cut is rejected (the <[^>]*> approximation)
    assert(x("""<a href="u3" """) === Seq("u3"))
    assert(x("""<a href="a>b">x</a>""") === Seq.empty)
    // raw values: no entity decode, relative links kept verbatim
    assert(x("""<a href="/rel?a=1&amp;b=2">r</a>""") === Seq("/rel?a=1&amp;b=2"))

    // null passthrough + codegen path + SQL surface
    val df = Seq((1L, Some("""<a href="k">k</a>""")), (2L, None))
      .toDF("id", "html")
      .select($"id", TextAnalysis.htmlLinks($"html").as("l"))
      .orderBy($"id").collect()
    assert(df(0).getSeq[String](1) === Seq("k"))
    assert(df(1).isNullAt(1))
    TopnFunctions.register(spark)
    assert(spark.sql("""SELECT html_links('<a href="q">q</a>') AS l""")
      .head.getSeq[String](0) === Seq("q"))
    val eL = intercept[Exception](
      spark.sql("SELECT html_links(42)").collect())
    assert(eL.getMessage.contains("html_links requires STRING"))
    // the link-graph front door composes: links -> url ops -> domains
    val doms = Seq("""<a href="https://sub.Example.co.uk/p">1</a>
        <a href="http://other.net/q?utm_a=1">2</a>""").toDF("html")
      .select(explode(TextAnalysis.htmlLinks($"html")).as("u"))
      .select(graft.pipeline.Urls.registeredDomain(
        graft.pipeline.Urls.urlHost($"u")).as("d"))
      .as[String].collect().toSet
    assert(doms === Set("example.co.uk", "other.net"))
  }

  test("incremental fingerprint pairs == batch pairs restricted to new ids; CC chain closes") {
    // random 64-bit fingerprints; every id % 3 == 1 is a near-twin of the
    // previous id (1-3 bits flipped), so pairs exist inside the store,
    // inside the new batch, and random chunk collisions cross the split
    val rnd = new scala.util.Random(13)
    val fpMap = scala.collection.mutable.LinkedHashMap[Long, Long]()
    (0L until 120L).foreach { id =>
      fpMap(id) =
        if (id % 3 == 1) {
          val flips = 1 + rnd.nextInt(3)
          (0 until flips).foldLeft(fpMap(id - 1))((a, _) => a ^ (1L << rnd.nextInt(64)))
        } else rnd.nextLong()
    }
    val all = fpMap.toSeq.toDF("id", "fp")
    val store = all.filter($"id" < 80)
    val fresh = all.filter($"id" >= 80)

    val batch = Dedup.fingerprintPairs(all, "id", "fp", maxDist = 3)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val storeOnly = Dedup.fingerprintPairs(store, "id", "fp", maxDist = 3)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val inc = Dedup.incrementalFingerprintPairs(fresh, store, "id", "fp", maxDist = 3)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(inc === (batch -- storeOnly),
      "incremental pairs must be exactly the batch pairs touching a new id")
    assert(inc.forall { case (a, b) => a >= 80 || b >= 80 })
    assert(inc.nonEmpty, "fixture must actually produce new-batch pairs")

    // chain: store labels + incremental pairs through incrementalUpdate
    // must equal batch CC over the whole corpus — node sets included,
    // since storeOnly ∪ inc is exactly the batch pair list
    val storePairs = Dedup.fingerprintPairs(store, "id", "fp", maxDist = 3)
    val oldLabels = Clustering.connectedComponents(storePairs, "doc_a", "doc_b")
    val incPairs = Dedup.incrementalFingerprintPairs(fresh, store, "id", "fp", 3)
    val merged = Clustering.incrementalUpdate(oldLabels, incPairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    val batchCC = Clustering.connectedComponents(
      Dedup.fingerprintPairs(all, "id", "fp", maxDist = 3), "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(merged === batchCC)
  }

  test("adversarial duplication soak: LSH dedup tier matches the exact scan") {
    // 10 copies of the corpus — every doc has 9 exact duplicates, the
    // worst case for pair generation (promoted from docs/BENCH_NOTES.md).
    // At high threshold the banding catches near-1.0-Jaccard pairs w.p.
    // ~1, so the sub-quadratic tier must find the IDENTICAL pair set.
    val corpus = (0 until 10).map(i =>
      docs.select(($"doc_id" * 10 + i).as("doc_id"), $"text")).reduce(_ unionAll _)
    val nDocs = docs.count()
    val exact = Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.8,
      maxShingleDf = 100000) // uncapped: the soak needs the true pair set
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(corpus, "doc_id", "text", threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // every duplicated doc contributes C(10,2) = 45 exact-dup pairs
    assert(exact.size >= 45 * nDocs, s"soak fixture too small: ${exact.size}")
    assert(lsh === exact,
      s"LSH missed ${(exact -- lsh).size}, invented ${(lsh -- exact).size}")
  }

  test("lshNearDupPairs: shape, determinism, recall vs exact tier") {
    val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 20)
    val lsh = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 20, dim = 64)
    assert(lsh.columns.toSeq === Seq("rank", "doc_a", "doc_b"))
    val e = exact.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val run1 = lsh.orderBy("rank").as[(Long, Long, Long)].collect().toSeq
    val run2 = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 20, dim = 64)
      .orderBy("rank").as[(Long, Long, Long)].collect().toSeq
    assert(run1 === run2, "same input + seed must give identical output")
    val hit = run1.map(r => (r._2, r._3)).toSet.intersect(e).size
    assert(hit >= e.size * 8 / 10, s"LSH near-dup recall too low: $hit/${e.size}")
  }

  test("lshNearDupPairs two-pass shortlist: exact on the near-dup regime, bounded drift off it") {
    // The r18 two-pass verify (128-bit signature rank -> exact rerank of
    // the shortlist) is an OPT-IN for the high-margin near-dup regime.
    // Regime 1 — planted near-dups (the regime the knob is for): 2,000
    // random 64-dim vectors plus 40 planted twins at cosine ~0.999; the
    // candidate set is ~2M pairs, so the 65,536 shortlist is a genuine
    // ~30x prune, and the report must be BIT-IDENTICAL to exactly
    // scoring every candidate (twins sit ~50 Hamming bits above the
    // crowd — no boundary to misrank).
    val n = 2000
    def coord(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(63)), j =>
        ((pmod(xxhash64(id, j), lit(1000)) - 500).cast("double") / 500.0))
    val base = spark.range(n).select(col("id").as("vec_id"),
      coord(col("id")).cast("array<float>").as("embedding"))
    val twins = spark.range(40).select((col("id") + n).as("vec_id"),
      zip_with(coord(col("id")),
        transform(sequence(lit(0), lit(63)), j =>
          (pmod(xxhash64(col("id") + n, j), lit(100)) - 50)
            .cast("double") / 5000.0),
        (v, eps) => v + eps).cast("array<float>").as("embedding"))
    val planted = base.unionByName(twins)
    val exact = Similarity.lshNearDupPairs(planted, "vec_id", "embedding",
      40, dim = 64, knownCount = n + 40L)
      .orderBy("rank").as[(Long, Long, Long)].collect().toSeq
    val two = Similarity.lshNearDupPairs(planted, "vec_id", "embedding",
      40, dim = 64, knownCount = n + 40L,
      shortlist = Similarity.AutoShortlist)
      .orderBy("rank").as[(Long, Long, Long)].collect().toSeq
    assert(exact.size === 40 &&
      exact.forall(r => r._3 === r._2 + n),
      s"fixture defect: top-40 should be the planted twins, got $exact")
    assert(two === exact,
      "near-dup regime: the signature shortlist must not change the report")

    // Regime 2 — organic low-margin top-k (what the scaladoc warns
    // about): boundary pairs sit within a few degrees of the crowd, so
    // the shortlist drifts the tail. Record the measured bound instead
    // of pretending exactness: >= 40/50 overlap on sf0.1's 1.28M
    // candidates (deterministic: fixed corpus, seeded planes; measured
    // 45/50 when the knob shipped).
    val emb01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val n01 = emb01.count()
    val oneOrg = Similarity.lshNearDupPairs(emb01, "vec_id", "embedding", 50,
      dim = 64, knownCount = n01)
      .as[(Long, Long, Long)].collect().map(r => (r._2, r._3)).toSet
    val twoOrg = Similarity.lshNearDupPairs(emb01, "vec_id", "embedding", 50,
      dim = 64, knownCount = n01, shortlist = Similarity.AutoShortlist)
      .as[(Long, Long, Long)].collect().map(r => (r._2, r._3)).toSet
    val overlap = oneOrg.intersect(twoOrg).size
    assert(overlap >= 40,
      s"organic-corpus shortlist overlap collapsed: $overlap/50")
    intercept[IllegalArgumentException](
      Similarity.lshNearDupPairs(emb01, "vec_id", "embedding", 50,
        dim = 64, shortlist = 10)) // positive but < topPairs

    // the margin AUDIT discriminates the two regimes (the shortlist
    // doctrine as a measurement): planted near-dups sit far above the
    // crowd (wide margin — shortlist safe), the organic corpus's
    // boundary pairs sit inside it (thin margin — use NoShortlist)
    val mPlanted = Similarity.shortlistMargin(planted, "vec_id",
      "embedding", 40, dim = 64, knownCount = n + 40L).collect().head
    val mOrganic = Similarity.shortlistMargin(emb01, "vec_id",
      "embedding", 50, dim = 64, knownCount = n01).collect().head
    val (plantedMargin, organicMargin) =
      (mPlanted.getAs[Int]("margin"), mOrganic.getAs[Int]("margin"))
    assert(plantedMargin >= 18,
      s"planted fixture must audit as safe (>= 18 bits), got $mPlanted")
    assert(organicMargin < 18,
      s"organic corpus must audit as thin-margin (< 18 bits), got $mOrganic")
    assert(mOrganic.getAs[Long]("n_candidates") > 1000000L,
      s"fixture defect: expected ~1.28M organic candidates, got $mOrganic")

    // AUDITED mode (r18 verdict task 3): the bar is wired, not doctrine —
    // the audit itself chooses. Planted regime: wide margin -> two-pass;
    // organic: thin margin -> exact. auditShortlist returns the same
    // margins the raw audit rows carry.
    val (auditPlantedMargin, usePlanted) = Similarity.auditShortlist(
      planted, "vec_id", "embedding", 40, dim = 64, knownCount = n + 40L)
    assert(usePlanted && auditPlantedMargin === plantedMargin,
      s"planted regime must audit into the two-pass path ($auditPlantedMargin)")
    val (auditOrganicMargin, useOrganic) = Similarity.auditShortlist(
      emb01, "vec_id", "embedding", 50, dim = 64, knownCount = n01)
    assert(!useOrganic && auditOrganicMargin === organicMargin,
      s"organic corpus must audit into the exact path ($auditOrganicMargin)")
    // end to end: AuditedShortlist on the organic corpus must produce the
    // EXACT report (the audit chose NoShortlist), not the drifted one
    val auditedOrg = Similarity.lshNearDupPairs(emb01, "vec_id", "embedding",
      50, dim = 64, knownCount = n01, shortlist = Similarity.AuditedShortlist)
      .as[(Long, Long, Long)].collect().map(r => (r._2, r._3)).toSet
    assert(auditedOrg === oneOrg,
      "audited mode on a thin-margin corpus must ship the exact report")

    // AutoShortlist resolution is Long-safe (r18 ADVICE): 1024 * topPairs
    // overflowed Int past 2^21 topPairs and silently truncated the report
    assert(Similarity.autoShortlistN(10) === 65536)
    assert(Similarity.autoShortlistN(1000000) === 1024000000)
    assert(Similarity.autoShortlistN(3000000) === Int.MaxValue,
      "past the Int boundary the clamp must keep shortlist >= topPairs")
    assert(Similarity.autoShortlistN(Int.MaxValue) === Int.MaxValue)
  }

  test("autoBits holds expected bucket occupancy as the corpus grows") {
    // occupancy n / 2^bits stays near the target: the classic 4 bits at
    // the 2k-vector sf0.1 corpus, one more bit roughly per doubling —
    // exactly the 4/6/7 series the growth row was hand-tuned to
    assert(Similarity.autoBits(2000L) === 4)
    assert(Similarity.autoBits(8000L) === 6)
    assert(Similarity.autoBits(20000L) === 7)
    assert(Similarity.autoBits(1L) === 1)         // floor
    assert(Similarity.autoBits(Long.MaxValue >> 8) === 24) // ceiling
    // the auto default and the explicit spelling agree end to end
    val auto = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 20, dim = 64)
      .orderBy("rank").as[(Long, Long, Long)].collect().toSeq
    val explicit = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 20,
      dim = 64, bitsPerTable = Similarity.autoBits(emb.count()))
      .orderBy("rank").as[(Long, Long, Long)].collect().toSeq
    assert(auto === explicit)
    // a caller-supplied count (table stats) skips the plan-build count()
    // job but must pick the identical width — same report, byte for byte
    val known = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 20,
      dim = 64, knownCount = emb.count())
      .orderBy("rank").as[(Long, Long, Long)].collect().toSeq
    assert(known === auto)
    intercept[IllegalArgumentException](
      Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 20, dim = 64,
        bitsPerTable = -1))
  }

  test("near-dup tiers raise on ids outside [0, 2^31) instead of corrupting packs") {
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    val v = Array.fill(8)(0.5f)
    val bad = Seq((2147483648L, v), (1L, v.map(_ + 0.1f)), (2L, v.map(_ - 0.1f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[Throwable](
      Similarity.cosineNearDupPairs(bad, "vec_id", "embedding", 5).collect())
    assert(messages(e1).exists(_.contains("[0, 2^31)")), s"got: ${messages(e1)}")
    val e2 = intercept[Throwable](
      Similarity.lshNearDupPairs(bad, "vec_id", "embedding", 5, dim = 8).collect())
    assert(messages(e2).exists(_.contains("[0, 2^31)")), s"got: ${messages(e2)}")
  }

  test("lshNearDupPairs: duplicate input ids yield no self-pairs and one rank per pair") {
    val v = Array.fill(8)(0.5f)
    // id 1 appears twice with DIFFERENT vectors: the vector re-join must
    // not let the same (a, b) occupy several ranks
    val d = Seq((1L, v), (1L, v.map(_ + 0.05f)), (2L, v.map(_ * 2.0f)),
      (3L, v.map(_ + 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.lshNearDupPairs(d, "vec_id", "embedding", 10, dim = 8)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r._2 < r._3),
      s"self/unordered pairs leaked: ${out.mkString(", ")}")
    val pairs = out.map(r => (r._2, r._3))
    assert(pairs.distinct.length === pairs.length,
      s"pair ranked more than once: ${out.mkString(", ")}")
  }

  test("lshBuckets validates bitsPerTable / tables / dim") {
    intercept[IllegalArgumentException](Similarity.lshBuckets(col("v"), 8, 33, 2))
    intercept[IllegalArgumentException](Similarity.lshBuckets(col("v"), 8, 0, 2))
    intercept[IllegalArgumentException](Similarity.lshBuckets(col("v"), 8, 4, 0))
    intercept[IllegalArgumentException](Similarity.lshBuckets(col("v"), 0, 4, 2))
  }

  test("pipeline expressions work from pure SQL (registered function surface)") {
    TopnFunctions.register(spark)
    val sim = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>))""".stripMargin)
      .as[Double].collect().head
    assert(sim === 1.0)
    val shingles = spark.sql("SELECT token_shingles('a b c d')")
      .as[Seq[String]].collect().head
    assert(shingles === Seq("a b c", "b c d"))
    val sig = spark.sql("SELECT minhash_signature(array('x', 'y'), 4)")
      .as[Seq[Long]].collect().head
    assert(sig.length === 4)
    // must equal the DataFrame-API spelling bit for bit
    val sigDf = Seq(Seq("x", "y")).toDF("sh")
      .select(Dedup.minhashSignature($"sh", 4)).as[Seq[Long]].collect().head
    assert(sig === sigDf)
    assert(spark.sql("SELECT simhash64(array('a','b'))").as[Long].collect().head ===
      spark.sql("SELECT simhash64(array('a','b'))").as[Long].collect().head)
    val buckets = spark.sql(
      "SELECT lsh_buckets(CAST(array(0.1, 0.2) AS ARRAY<FLOAT>), 2, 4, 3)")
      .as[Seq[Long]].collect().head
    assert(buckets.length === 3)
    val top = spark.sql(
      """SELECT topk_by_score(id, score, 2) FROM VALUES
        |  (1L, 0.5D), (2L, 0.9D), (3L, 0.1D) AS t(id, score)""".stripMargin)
      .as[Seq[(Long, Double)]].collect().head
    assert(top.map(_._1) === Seq(2L, 1L))
    // wrong arity surfaces an informative error, not IndexOutOfBounds
    val e = intercept[Exception](spark.sql("SELECT lsh_buckets(array(1.0))").collect())
    def msgs(t: Throwable) = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(_.contains("lsh_buckets expects 4 to 5 arguments")),
      s"got: ${msgs(e)}")
  }

  test("MinHashSignature matches the composed spelling on null elements too") {
    val df = Seq(1).toDF("x").select(
      array(lit("a"), lit(null: String), lit("b")).as("sh"))
    val composed = df.select(array((0 until 8).map { i =>
      array_min(transform($"sh", s => xxhash64(s, lit(42L), lit(i))))
    }: _*)).as[Seq[Long]].collect().head
    val native = df.select(Dedup.minhashSignature($"sh", 8))
      .as[Seq[Long]].collect().head
    assert(native === composed)
  }

  test("PairGen emits exactly the strict i<j pairs of each bucket (property)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalatest.prop.Configuration
    val prop = Prop.forAll(
      Gen.mapOf(Gen.zip(Gen.chooseNum(0, 5),
        Gen.listOfN(6, Gen.chooseNum(0L, 20L)).map(_.distinct)))) { buckets =>
      val rows = buckets.toSeq.flatMap { case (b, ids) => ids.map(b -> _) }
      rows.isEmpty || {
        val df = spark.createDataFrame(rows).toDF("bucket", "id")
        val got = graft.pipeline.PairGen.explodePairs(
          graft.pipeline.PairGen.buckets(df, Seq(col("bucket")), col("id"), 100),
          "xs", "a", "b").as[(Long, Long)].collect().toSet
        val want = buckets.values.flatMap { ids =>
          val s = ids.sorted
          for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j))
        }.toSet
        got == want
      }
    }
    val cfg = org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30)
    val res = org.scalacheck.Test.check(cfg, prop)
    assert(res.passed, res.status.toString)
  }

  test("PairGen.allPairs: tiled hot buckets emit exactly the fast path's pairs (property)") {
    import org.scalacheck.{Gen, Prop}
    // buckets up to 23 ids with tileSize 4 force multi-tile decomposition,
    // including duplicate ids (a dup flood has equal elements)
    val prop = Prop.forAll(
      Gen.mapOf(Gen.zip(Gen.chooseNum(0, 3),
        Gen.listOfN(23, Gen.chooseNum(0L, 9L))))) { buckets =>
      val rows = buckets.toSeq.flatMap { case (b, ids) => ids.map(b -> _) }
      rows.isEmpty || {
        val df = spark.createDataFrame(rows).toDF("bucket", "id")
        def pairs(tile: Int) = graft.pipeline.PairGen.allPairs(
          df, Seq(col("bucket")), col("id"), tile, "a", "b")
          .groupBy("a", "b").count().as[(Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        // multiset equality: tiling must not lose OR duplicate any pair
        pairs(4) == pairs(1000)
      }
    }
    val cfg = org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15)
    val res = org.scalacheck.Test.check(cfg, prop)
    assert(res.passed, res.status.toString)
  }

  test("allPairs hardMaxBucket is the only drop path and is opt-in") {
    val df = (0L until 30L).map(i => ("hot", i)).toDF("bucket", "id")
    val kept = graft.pipeline.PairGen.allPairs(
      df, Seq(col("bucket")), col("id"), 5, "a", "b").count()
    assert(kept === 30L * 29 / 2) // default: tiled, nothing dropped
    val dropped = graft.pipeline.PairGen.allPairs(
      df, Seq(col("bucket")), col("id"), 5, "a", "b", hardMaxBucket = 20).count()
    assert(dropped === 0L) // explicit bound drops the oversize bucket whole
  }

  test("near-dup flood past maxBucket: LSH dedup keeps the exact pair set") {
    // The round-6 failure mode: a flood of TEMPLATED (near-dup, not exact)
    // spam larger than maxBucket used to blow the band-bucket cap and
    // silently lose every pair in it. With tiling, a tiny maxBucket must
    // reproduce the unconstrained run bit for bit.
    val flood = (0L until 60L).map(i =>
      (i, s"breaking news spam template number thing item $i click here now"))
    val dups = (100L until 120L).map(i =>
      (i, "an exactly duplicated document body repeated many times over"))
    val clean = Seq((200L, "completely unrelated text about turtles and rivers"),
      (201L, "another unique document discussing compilers"))
    val docs = (flood ++ dups ++ clean).toDF("doc_id", "text")

    def run(cap: Int) = Dedup.minhashLshPairs(
      docs, "doc_id", "text", threshold = 0.5, maxBucket = cap)
      .as[(Long, Long, Double)].collect().toSet
    val constrained = run(8) // every flood/dup bucket overflows -> tiled
    val reference = run(1000000) // fast path everywhere
    assert(constrained === reference)
    // and the flood itself was actually caught, not vacuously equal
    assert(reference.exists(p => p._1 < 60L && p._2 < 60L))
    assert(reference.count(p => p._1 >= 100L && p._2 < 200L) === 20 * 19 / 2)

    // same guarantee for the SimHash tier
    def runSim(cap: Int) = Dedup.simhashPairs(docs, "doc_id", "text",
      maxDist = 3, maxBucket = cap).as[(Long, Long, Long)].collect().toSet
    assert(runSim(8) === runSim(1000000))
    assert(runSim(8).nonEmpty)
  }

  test("embedding near-dup flood past maxBucket keeps the exact pair set") {
    val base = Array.tabulate(8)(i => 0.1f * (i + 1))
    // 40 near-identical vectors (one coordinate nudged) + a few far ones
    val rows = (0L until 40L).map { i =>
      val v = base.clone(); v((i % 8).toInt) += 0.001f * (i / 8 + 1); (i, v.toSeq)
    } ++ Seq((50L, Seq.fill(8)(-1.0f)), (51L, (1 to 8).map(i => (9 - i) * -0.2f)))
    val vecs = rows.toDF("id", "vec")
    def run(cap: Int) = Similarity.lshNearDupPairs(
      vecs, "id", "vec", topPairs = 100, dim = 8, maxBucket = cap)
      .as[(Long, Long, Long)].collect().toSet
    assert(run(6) === run(1000000))
    assert(run(6).size === 100)
  }

  test("exact dedup groups: normalized variants share a fingerprint") {
    val d = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val g = Dedup.exactGroups(d, "doc_id", "text")
      .orderBy("keep_id").as[(String, Long, Long)].collect()
    assert(g.length === 2)
    assert(g(0)._2 === 1L && g(0)._3 === 2L) // dup group keeps min id
  }

  // --- feature-hashing embeddings -----------------------------------------

  /** Reference bucket: the same md5-prefix hash as Dsir.featureBucket,
    * computed with java.security. */
  private def embBucket(w: String, dim: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % dim
  }

  test("hashedCounts match a plain-Scala histogram exactly") {
    import graft.pipeline.Embedding
    val docs = Seq(
      (1L, "a b a c a"), (2L, "b b"), (3L, ""), (4L, "unique tokens only"))
      .toDF("doc_id", "text")
    for (dim <- Seq(4, 256)) { // dim 4 forces collisions
      val got = Embedding.hashedCounts(docs, "doc_id", "text", dim)
        .as[(Long, Seq[Long])].collect().toMap
      val want = Seq(
        1L -> "a b a c a", 2L -> "b b", 3L -> "", 4L -> "unique tokens only")
        .map { case (id, t) =>
          val h = Array.fill(dim)(0L)
          t.trim.split("\\s+").foreach(w => h(embBucket(w, dim).toInt) += 1)
          id -> h.toSeq
        }.toMap
      assert(got === want, s"dim=$dim")
    }
  }

  test("hashedEmbedding is unit-norm and feeds SemDedup end to end") {
    import graft.pipeline.{Embedding, IVF, SemDedup}
    // 30 distinct docs + exact re-phrasings of the first three: the text
    // -> vector -> semantic-dedup path must group each pair
    val base = (0L until 30L).map(id =>
      (id, (0 until 8).map(j => s"w${(id * 3 + j * 7) % 40}").mkString(" ")))
    val docs = (base ++ base.take(3).map { case (id, t) => (id + 100L, t) })
      .toDF("doc_id", "text")
    val emb = Embedding.hashedEmbedding(docs, "doc_id", "text", dim = 64).cache()
    val norms = emb.select(
      abs(aggregate($"embedding", lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double")) - 1.0d).as("d"))
      .agg(max($"d")).as[Double].head()
    assert(norms < 1e-6, s"embeddings must be unit-norm, max |n2-1| = $norms")
    val model = IVF.train(emb, "doc_id", "embedding", k = 4)
    val labels = SemDedup.labels(emb, "doc_id", "embedding", model, tau = 0.999)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
    (0L until 3L).foreach { id =>
      assert(labels(id + 100L) === labels(id),
        s"exact re-phrasing $id must share its original's cluster")
    }
  }

  test("hashed embedding dim validation") {
    import graft.pipeline.Embedding
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Embedding.hashedCounts(df, "doc_id", "text", 1))
    intercept[IllegalArgumentException](
      Embedding.hashedEmbedding(df, "doc_id", "text", 1 << 17))
  }

  // --- bloom-pruned cross-corpus dedup ------------------------------------

  test("bloomAntiJoin equals the plain anti join at any fpp") {
    import graft.pipeline.Dedup
    val left = (0L until 200L).map(i => (i, s"k${i % 80}")).toDF("id", "k")
    val right = (0L until 40L).map(i => (i, s"k${i * 2}")).toDF("rid", "k")
    val expected = left.join(right.select($"k"), Seq("k"), "left_anti")
      .select($"id").as[Long].collect().sorted.toSeq
    // fpp only prunes: even a useless half-full filter stays exact
    for (fpp <- Seq(0.0001, 0.03, 0.5)) {
      val got = Dedup.bloomAntiJoin(left, right, "k", 40L, fpp)
        .select($"id").as[Long].collect().sorted.toSeq
      assert(got === expected, s"fpp=$fpp")
    }
    // undersized filter degrades pruning, never the answer
    val undersized = Dedup.bloomAntiJoin(left, right, "k", 2L, 0.03)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(undersized === expected)
  }

  test("crossCorpusDedup drops exactly the incoming docs already in the reference") {
    import graft.pipeline.Dedup
    val incoming = Seq(
      (1L, "shared exact  text"), // normalizes to a ref fingerprint
      (2L, "fresh text one"),
      (3L, "SHARED EXACT TEXT"), // case-insensitive fingerprint match
      (4L, "fresh text two")).toDF("doc_id", "text")
    val reference = Seq(
      (100L, "shared exact text"),
      (101L, "reference only prose")).toDF("doc_id", "text")
    val kept = Dedup.crossCorpusDedup(incoming, reference, "doc_id", "text",
      expectedRefItems = 10L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(2L, 4L))
    // empty reference keeps everything
    val all = Dedup.crossCorpusDedup(incoming, reference.limit(0),
      "doc_id", "text", expectedRefItems = 1L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(all === Seq(1L, 2L, 3L, 4L))
  }

  test("bloomAntiJoin validates its parameters") {
    import graft.pipeline.Dedup
    val df = Seq((1L, "a")).toDF("id", "k")
    intercept[IllegalArgumentException](Dedup.bloomAntiJoin(df, df, "k", 0L))
    intercept[IllegalArgumentException](Dedup.bloomAntiJoin(df, df, "k", 1L, 1.0))
    intercept[IllegalArgumentException](Dedup.bloomAntiJoin(df, df, "id", 1L))
  }
}
