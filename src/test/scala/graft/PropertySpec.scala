package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Relational

/** Property-based equivalences from SURVEY.md §5.4: the reference's
  * emulated operators must agree with the native Spark forms on
  * arbitrary generated inputs (scalacheck Gen, fixed seeds). */
class PropertySpec extends SparkTestBase {

  private val rowsGen = Gen.listOfN(40,
    Gen.zip(Gen.choose(0, 8), Gen.choose(0, 20), Gen.choose(0, 5)))

  private val params = Gen.Parameters.default

  private def sample(seed: Long): List[(Int, Int, Int)] =
    rowsGen.pureApply(params, Seed(seed))

  test("left_anti == LEFT JOIN + right-key IS NULL (J4 emulation)") {
    import spark.implicits._
    (1L to 5L).foreach { seed =>
      val l = sample(seed).toDF("k", "v", "x")
      val r = sample(seed + 100).map(t => (t._1, t._2)).toDF("rk", "rv")
      val native = l.join(r.select("rk").distinct(),
        l("k") === col("rk"), "left_anti")
      val emulated = l.join(r.select("rk").distinct(),
        l("k") === col("rk"), "left")
        .filter(col("rk").isNull).drop("rk")
      assert(native.exceptAll(emulated).isEmpty &&
        emulated.exceptAll(native).isEmpty, s"seed $seed")
    }
  }

  test("groupBy+join-back == window row_number on tie-free data (J7)") {
    import spark.implicits._
    (1L to 5L).foreach { seed =>
      // make (k, v) tie-free: one row per (k, v)
      val df = sample(seed).toDF("k", "v", "x")
        .groupBy("k", "v").agg(max("x").as("x"))
      val joinBack = Relational.maxPerGroupJoinBack(df, "k", "v")
        .select("k", "v", "x")
      val windowed = Relational.latestPerGroup(df, Seq("k"),
          Seq(col("v").desc))
        .select("k", "v", "x")
      assert(joinBack.exceptAll(windowed).isEmpty &&
        windowed.exceptAll(joinBack).isEmpty, s"seed $seed")
    }
  }

  test("unpivot == union-all of per-measure selects (U2)") {
    import spark.implicits._
    (1L to 5L).foreach { seed =>
      val df = sample(seed).toDF("id", "m1", "m2")
      val stacked = Relational.unpivot(df, Seq("id"),
        Seq("a" -> "m1", "b" -> "m2"))
      val unioned = df.select(col("id"), lit("a").as("measure"), col("m1").as("val"))
        .union(df.select(col("id"), lit("b").as("measure"), col("m2").as("val")))
      assert(stacked.exceptAll(unioned).isEmpty &&
        unioned.exceptAll(stacked).isEmpty, s"seed $seed")
    }
  }

  test("snapshotDiff changelog applied to old reconstructs new exactly") {
    import spark.implicits._
    (1L to 5L).foreach { seed =>
      // keyed snapshots: last write wins within each generated list
      val oldSnap = sample(seed).toDF("k", "a", "b")
        .groupBy("k").agg(max("a").as("a"), max("b").as("b"))
      val newSnap = sample(seed + 50).toDF("k", "a", "b")
        .groupBy("k").agg(max("a").as("a"), max("b").as("b"))
      val diff = Relational.snapshotDiff(oldSnap, newSnap, "k", Seq("a", "b"))
      // apply: drop deleted+updated keys from old, add insert+update rows
      val changedKeys = diff.filter(col("change_type").isin("delete", "update"))
        .select(col("k"))
      val applied = oldSnap
        .join(changedKeys, Seq("k"), "left_anti")
        .unionByName(diff.filter(col("change_type").isin("insert", "update"))
          .select("k", "a", "b"))
      assert(applied.exceptAll(newSnap).isEmpty &&
        newSnap.exceptAll(applied).isEmpty, s"seed $seed")
    }
  }

  test("scd2 ranges tile each key's change history without gaps/overlap") {
    import spark.implicits._
    (1L to 5L).foreach { seed =>
      val df = sample(seed).map(t => (t._1, t._2, t._3))
        .distinct.toDF("k", "ts", "status")
      val out = Relational.scd2(df, "k", "ts", Seq("status"), Seq("status"))
        .select("k", "valid_from", "valid_to").collect()
        .map(r => (r.getInt(0), r.getInt(1),
          Option(r.get(2)).map(_.asInstanceOf[Int])))
      out.groupBy(_._1).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._2)
        // exactly one open (current) range per key, and it is the last
        assert(sorted.count(_._3.isEmpty) == 1 && sorted.last._3.isEmpty)
        // each range closes exactly where the next opens
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._3.contains(b._2))
          case _ =>
        }
      }
    }
  }

  test("int8 quantization preserves cosine similarity to 3 decimal places") {
    import spark.implicits._
    val dims = 32
    val vecs = (1L to 200L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Array.fill(dims)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    val q = graft.operators.Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .select(col("vec_id"),
        expr("transform(q_vec, x -> x * scale_max / 127.0)").as("deq"))
    val joined = vecs.join(q, "vec_id")
      .select(graft.operators.Similarity.cosine(
        col("embedding").cast("array<double>"), col("deq")).as("cos"))
    val worst = joined.agg(min(col("cos"))).head.getDouble(0)
    assert(worst > 0.999, s"quantization degraded cosine to $worst")
  }

  test("ngramLmScore is partition-invariant (rounded float aggregate is stable)") {
    // the lm score is round(avg(ln(...)), 6) over distributed partial
    // sums — this pins that the 1e-6 rounding boundary absorbs
    // summation-order differences across partitionings, which is what
    // keeps the DuckDB oracle comparable on any cluster layout
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    def scores(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.ngramLmScore(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val base = scores(docs)
    val repart = scores(docs.repartition(7))
    assert(base.keySet == repart.keySet)
    assert(base.nonEmpty)
    base.foreach { case (id, (n, score)) =>
      val (n2, score2) = repart(id)
      assert(n == n2)
      // epsilon, not exact equality: a true average sitting within
      // float error of a 0.5e-6 rounding boundary may legitimately
      // round to a different 6th digit under a different sum order
      assert(math.abs(score - score2) <= 1e-6, s"doc $id: $score vs $score2")
    }
  }

  test("connectedComponents == brute-force union-find on random graphs") {
    import spark.implicits._
    // ground truth from a driver-side union-find with path compression
    def unionFind(edges: Seq[(Int, Int)]): Map[Int, Int] = {
      val parent = scala.collection.mutable.Map[Int, Int]()
      def find(x: Int): Int = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(n => n -> find(n)).toMap
    }
    (1L to 5L).foreach { seed =>
      val edges = sample(seed).map(t => (t._1, t._2 + 3)).distinct
        .filter(e => e._1 != e._2)
      val got = graft.operators.Dedup
        .connectedComponents(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val expected = unionFind(edges)
      assert(got == expected, s"seed $seed")
    }
  }

  test("per-bucket star edges yield the same components as all bucket pairs") {
    import spark.implicits._
    // random (doc, bucket) memberships — docs sharing any bucket are
    // candidates; the star replaces the quadratic per-bucket pair list
    (1L to 5L).foreach { seed =>
      val memb = sample(seed).map(t => (t._2, t._1)).distinct // (doc, bucket)
        .toDF("doc", "bucket")
      val pairs = memb.as("a").join(memb.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
        .select(col("a.doc").as("id_a"), col("b.doc").as("id_b")).distinct()
      val centers = memb.groupBy("bucket").agg(min(col("doc")).as("center"))
      val stars = memb.join(centers, "bucket")
        .filter(col("doc") =!= col("center"))
        .select(col("doc").as("id_a"), col("center").as("id_b"))
      val viaPairs = graft.operators.Dedup
        .connectedComponents(pairs, "id_a", "id_b")
      val viaStars = graft.operators.Dedup
        .connectedComponents(stars, "id_a", "id_b")
      assert(viaPairs.exceptAll(viaStars).isEmpty &&
        viaStars.exceptAll(viaPairs).isEmpty, s"seed $seed")
    }
  }

  test("segmentDedup is partition-invariant (first occurrence is a total order)") {
    // first occurrence = min (doc_id, pos) — a data property, not an
    // arrival-order property, so any partitioning must reproduce the
    // exact same surviving text per doc
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.segmentDedup(df, "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getInt(3))))
        .toMap
    val base = run(docs)
    val repart = run(docs.repartition(7))
    assert(base == repart)
    assert(base.nonEmpty)
  }

  test("exactSubstringDedup is partition-invariant and conserves token counts") {
    // keep-first = min (doc_id, pos) per shingle digest — a data
    // property like segmentDedup's, so any partitioning reproduces
    // the identical residual text; and every doc's n_tokens must
    // equal its input token count with n_removed = dropped tokens
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.exactSubstringDedup(df, "doc_id", "text", 8)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
    val base = run(docs)
    assert(base == run(docs.repartition(7)))
    val inTokens = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").length).toMap
    assert(base.nonEmpty && base.forall { case (id, (txt, n, rem)) =>
      n == inTokens(id) &&
        (txt.isEmpty && n == rem ||
          txt.split(" ").length == n - rem)
    })
  }

  test("heavyHitters: sketch prunes, never reports — output equals the exact aggregation") {
    import spark.implicits._
    // skewed planted corpus: token "hot_i" appears (10-i)*40 times,
    // plus a long tail of singletons; support 0.05 puts a cutoff
    // strictly between hot ranks — the exact answer is known
    val rows =
      (0 until 10).flatMap(i => Seq.fill((10 - i) * 40)(s"hot_$i")) ++
        (0 until 800).map(j => s"tail_$j")
    val docs = rows.grouped(50).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val support = 0.05
    val got = graft.operators.TextAnalysis.heavyHitters(docs, "text", support)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = rows.size
    val exact = rows.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
      .filter(_._2 > support * total)
    assert(got == exact, s"got=$got exact=$exact")
    assert(got.nonEmpty && !got.keys.exists(_.startsWith("tail_")))
    // partition-invariance: the two-pass result is a data property
    val repart = graft.operators.TextAnalysis
      .heavyHitters(docs.repartition(7), "text", support)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(repart == exact)
  }

  test("imageAHash key is invariant under ANY non-clipping brightness shift") {
    import spark.implicits._
    import graft.sources.Multimodal
    // random images (seeded), random shift per case — the operator's
    // invariance claim is algebraic (integer cross-multiplication and
    // floor-means shift exactly), so it must hold for every c, not
    // just the planted corpus's +40
    val rnd = new scala.util.Random(4242)
    val cases = (0 until 12).map { i =>
      val w = 4 + rnd.nextInt(12); val h = 4 + rnd.nextInt(12)
      val px = Array.fill(h, w)(rnd.nextInt(180)) // head-room for shift
      val c = 1 + rnd.nextInt(70)
      (i.toLong, px, px.map(_.map(_ + c)))
    }
    val media = cases.flatMap { case (id, base, shifted) =>
      Seq((id, "base", grayPng(base)), (id, "shift", grayPng(shifted)))
    }.toDF("media_id", "kind", "content")
    val out = Multimodal.imageAHash(media).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(4), r.getSeq[Int](5)))).toMap
    cases.foreach { case (id, _, _) =>
      assert(out(id -> "base") == out(id -> "shift"), s"case $id")
    }
  }

  test("audioFingerprint key is invariant under ANY non-clipping integer gain") {
    import spark.implicits._
    import graft.sources.Multimodal
    val rnd = new scala.util.Random(777)
    val cases = (0 until 12).map { i =>
      val n = 16 + rnd.nextInt(120)
      val s = Array.fill(n)(rnd.nextInt(8000) - 4000) // head-room for x4
      val g = 2 + rnd.nextInt(3)
      (i.toLong, s, s.map(_ * g))
    }
    val media = cases.flatMap { case (id, base, loud) =>
      Seq((id, "base", monoWav(base)), (id, "loud", monoWav(loud)))
    }.toDF("media_id", "kind", "content")
    val out = Multimodal.audioFingerprint(media).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(4), r.getSeq[Long](5)))).toMap
    cases.foreach { case (id, _, _) =>
      assert(out(id -> "base") == out(id -> "loud"), s"case $id")
    }
  }

  test("HtmlEntityDecode byte scanner == a char-level reference model on " +
      "random texts (multi-byte chars, partial refs, adversarial '&' runs)") {
    import org.apache.spark.unsafe.types.UTF8String
    // independent char-level model of the documented contract
    def model(s: String): String = {
      val names = Seq("lt" -> '<', "gt" -> '>', "quot" -> '"',
        "apos" -> '\'', "nbsp" -> ' ', "amp" -> '&')
      val win = Array(0x20AC, 0x81, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020,
        0x2021, 0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x8D, 0x017D, 0x8F,
        0x90, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
        0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x9D, 0x017E, 0x0178)
      def mapCp(v: Int) =
        if (v == 0 || v > 0x10FFFF || (v >= 0xD800 && v <= 0xDFFF)) 0xFFFD
        else if (v >= 0x80 && v <= 0x9F) win(v - 0x80) else v
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) != '&') { sb.append(s.charAt(i)); i += 1 }
        else if (i + 1 < s.length && s.charAt(i + 1) == '#') {
          var k = i + 2
          val hex = k < s.length && (s.charAt(k) == 'x' || s.charAt(k) == 'X')
          if (hex) k += 1
          val start = k
          var v = 0
          while (k < s.length && {
            val c = s.charAt(k)
            (c >= '0' && c <= '9') || (hex &&
              ((c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))
          }) {
            if (v <= 0x10FFFF)
              v = v * (if (hex) 16 else 10) + Character.digit(s.charAt(k), 16)
            k += 1
          }
          if (k > start && k < s.length && s.charAt(k) == ';') {
            sb.appendAll(Character.toChars(mapCp(v))); i = k + 1
          } else { sb.append('&'); i += 1 }
        } else {
          names.find { case (n, _) =>
            s.regionMatches(i + 1, n, 0, n.length) &&
              i + 1 + n.length < s.length && s.charAt(i + 1 + n.length) == ';'
          } match {
            case Some((n, r)) => sb.append(r); i += 2 + n.length
            case None => sb.append('&'); i += 1
          }
        }
      }
      sb.toString
    }
    val piece = Gen.oneOf(
      Gen.stringOfN(3, Gen.alphaNumChar),
      Gen.const("&"), Gen.const("&#"), Gen.const("&amp;"), Gen.const("&lt;"),
      Gen.const("&ampx"), Gen.const("&#39;"), Gen.const("&#x1F600;"),
      Gen.const("&#146;"), Gen.const("&#0;"), Gen.const("&#xD800;"),
      Gen.const("&#99999999999;"), Gen.const("&nbsp;"), Gen.const("&&&"),
      Gen.const("é世界🎉"), Gen.const(";"), Gen.const("&#x"),
      Gen.const("&quot"), Gen.const("&amp;lt;"))
    val texts = Gen.listOfN(12, piece).map(_.mkString)
    val seeds = (1 to 300).map(i => Seed(i.toLong))
    seeds.foreach { sd =>
      val s = texts.pureApply(Gen.Parameters.default, sd)
      val got = org.apache.spark.sql.graftext.HtmlEntityDecode
        .decode(UTF8String.fromString(s)).toString
      assert(got == model(s), s"input <$s>: got <$got> want <${model(s)}>")
    }
  }

  test("gunzipMembers: random multi-member roundtrip identity; any single " +
      "byte corruption in a trailer -> None") {
    val rnd = new scala.util.Random(7)
    def gz(data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(data); g.close()
      bos.toByteArray
    }
    (1 to 60).foreach { _ =>
      val members = (1 to (1 + rnd.nextInt(4))).map { _ =>
        val b = new Array[Byte](rnd.nextInt(2000))
        rnd.nextBytes(b); b
      }
      val file = members.map(gz).reduce(_ ++ _)
      val got = graft.sources.Warc.gunzipMembers(file)
      assert(got.exists(_.sameElements(members.reduce(_ ++ _))),
        s"roundtrip failed for ${members.map(_.length)}")
      // flip one bit in the LAST member's CRC trailer
      val bad = file.clone()
      bad(bad.length - 7) = (bad(bad.length - 7) ^ 0x10).toByte
      assert(graft.sources.Warc.gunzipMembers(bad).isEmpty,
        "corrupt trailer must erase the file")
      // truncate mid-stream
      assert(graft.sources.Warc.gunzipMembers(
        file.dropRight(1 + rnd.nextInt(9))).isEmpty,
        "truncation must erase the file")
    }
  }

  private def grayPng(px: Array[Array[Int]]): Array[Byte] = {
    val h = px.length; val w = px(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (r <- 0 until h; c <- 0 until w)
      img.getRaster.setSample(c, r, 0, px(r)(c))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def monoWav(samples: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le(v: Long, bytes: Int): Unit =
      (0 until bytes).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    val dataLen = samples.length * 2
    ascii("RIFF"); le(36L + dataLen, 4); ascii("WAVE")
    ascii("fmt "); le(16, 4); le(1, 2); le(1, 2)
    le(8000L, 4); le(16000L, 4); le(2, 2); le(16, 2)
    ascii("data"); le(dataLen.toLong, 4)
    samples.foreach(v => le(v.toLong & 0xffff, 2))
    out.toByteArray
  }

  test("canonicalize is idempotent and folds presentation variants (q109/q190 law)") {
    import spark.implicits._
    import graft.operators.UrlNormalize
    // URL components generated piecewise so every canonicalization
    // rule is exercised in combination
    val urlGen = for {
      scheme <- Gen.oneOf("http", "https")
      host <- Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
      tld <- Gen.oneOf("com", "example", "org")
      segs <- Gen.listOfN(2, Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString))
      qk <- Gen.listOfN(3, Gen.zip(Gen.alphaLowerChar, Gen.choose(0, 9)))
    } yield {
      val q = qk.map { case (k, v) => s"$k=$v" }
      (scheme, s"$host.$tld", "/" + segs.mkString("/"), q)
    }
    val cases = Gen.listOfN(60, urlGen).pureApply(params, Seed(7L))
    val rows = cases.zipWithIndex.flatMap { case ((sc, h, p0, q), i) =>
      val canonical = s"$sc://$h$p0" +
        (if (q.isEmpty) "" else "?" + q.sorted.mkString("&"))
      // presentation variants that MUST all fold to `canonical`:
      // upper scheme/host, explicit default port, ONE trailing slash,
      // shuffled query order, a fragment
      val port = if (sc == "https") ":443" else ":80"
      Seq(
        (i.toLong, canonical),
        (i.toLong, s"${sc.toUpperCase}://${h.toUpperCase}$p0" +
          (if (q.isEmpty) "" else "?" + q.sorted.mkString("&"))),
        (i.toLong, s"$sc://$h$port$p0/" +
          (if (q.isEmpty) "" else "?" + q.reverse.mkString("&")) + "#frag"))
        .map { case (id, u) => (id, u, canonical) }
    }
    val df = rows.toDF("id", "url", "expected")
      .withColumn("canon", UrlNormalize.canonicalize(col("url")))
    val bad = df.filter(col("canon") =!= col("expected")).collect()
    assert(bad.isEmpty, s"variants failed to fold: ${bad.take(3).toSeq}")
    // idempotence: canonicalize is a projection to its own fixed points
    val twice = df.select(col("canon"),
      UrlNormalize.canonicalize(col("canon")).as("canon2"))
    assert(twice.filter(col("canon") =!= col("canon2")).isEmpty,
      "canonicalize must be idempotent")
  }

  test("WARC record scan round-trips arbitrary payloads, including framing decoys") {
    import spark.implicits._
    import graft.sources.Warc
    // payloads drawn to maximize framing hazards: CRLF runs, the
    // record magic itself, header-shaped lines, empty payloads
    val payloadGen = Gen.frequency(
      (3, Gen.listOfN(20, Gen.asciiPrintableChar).map(_.mkString)),
      (2, Gen.const("WARC/1.0\r\nContent-Length: 7\r\n\r\ndecoy!!")),
      (2, Gen.const("\r\n\r\n\r\n")),
      (1, Gen.const("")),
      (2, Gen.listOfN(8, Gen.oneOf('\r', '\n', 'x', ' ')).map(_.mkString)))
    (1L to 5L).foreach { seed =>
      val payloads = Gen.listOfN(12, payloadGen).pureApply(params, Seed(seed))
      val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
      val file = payloads.zipWithIndex.map { case (pl, i) =>
        val body = pl.getBytes(latin1)
        s"WARC/1.0\r\nWARC-Type: response\r\n" +
          s"WARC-Target-URI: http://p/$i\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n" + pl + "\r\n\r\n"
      }.mkString
      val out = Warc.records(
          Seq((seed, file)).toDF("file_id", "raw")
            .select(col("file_id"),
              encode(col("raw"), "ISO-8859-1").as("content")),
          maxRecords = payloads.length)
        .select("rec_idx", "target_uri", "payload")
        .collect().sortBy(_.getInt(0))
      assert(out.length == payloads.length, s"seed $seed: ${out.length}")
      out.zip(payloads).zipWithIndex.foreach { case ((r, pl), i) =>
        assert(r.getString(1) == s"http://p/$i", s"seed $seed rec $i uri")
        assert(new String(r.getAs[Array[Byte]]("payload"), latin1) == pl,
          s"seed $seed rec $i payload")
      }
    }
  }

  test("HTTP envelope split round-trips arbitrary status/headers/bodies, " +
      "including header-shaped body decoys") {
    import spark.implicits._
    import graft.sources.Warc
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val statusGen = Gen.oneOf(200, 204, 301, 302, 404, 500, 503)
    // bodies drawn to maximize split hazards: CRLF runs, a fake
    // nested envelope, header-shaped lines
    val bodyGen = Gen.frequency(
      (3, Gen.listOfN(24, Gen.asciiPrintableChar).map(_.mkString)),
      (2, Gen.const("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nfake")),
      (2, Gen.const("Content-Type: text/plain\r\nX: y")),
      (1, Gen.const("")),
      (1, Gen.const("\r\n\r\n")))
    val mimeGen = Gen.oneOf("text/html", "text/plain", "image/png", "")
    val csGen = Gen.oneOf("", "utf-8", "windows-1251", "shift_jis")
    (1L to 5L).foreach { seed =>
      val rows = Gen.listOfN(10, Gen.zip(statusGen, mimeGen, csGen, bodyGen))
        .pureApply(params, Seed(seed))
      val files = rows.zipWithIndex.map { case ((st, mime, cs, body), i) =>
        val ct =
          if (mime.isEmpty) ""
          else if (cs.isEmpty) s"Content-Type: $mime\r\n"
          else s"Content-Type: $mime; charset=$cs\r\n"
        val http = (s"HTTP/1.1 $st X\r\n" + ct + "X-Pad: z\r\n\r\n")
          .getBytes(latin1) ++ body.getBytes(latin1)
        val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
          s"WARC-Target-URI: http://p/$i\r\n" +
          "Content-Type: application/http; msgtype=response\r\n" +
          s"Content-Length: ${http.length}\r\n\r\n").getBytes(latin1) ++
          http ++ "\r\n\r\n".getBytes(latin1)
        (i.toLong, rec)
      }
      val out = Warc.httpResponses(
          Warc.records(files.toDF("file_id", "content"),
            maxRecords = rows.length))
        .select(col("file_id"), col("http_status"), col("mime"),
          col("http_charset"), col("body"))
        .collect().sortBy(_.getLong(0))
      out.zip(rows).zipWithIndex.foreach { case ((r, (st, mime, cs, body)), i) =>
        // no media type ⇒ no Content-Type header was written at all,
        // so the charset param cannot surface either
        val ecs = if (mime.isEmpty) "" else cs
        assert(r.getInt(1) == st, s"seed $seed rec $i status")
        assert(r.getString(2) == mime, s"seed $seed rec $i mime")
        assert(r.getString(3) == ecs, s"seed $seed rec $i charset")
        assert(new String(r.getAs[Array[Byte]]("body"), latin1) == body,
          s"seed $seed rec $i body")
      }
    }
  }

  test("CharsetDecode is byte-exact inverse of getBytes for every label it " +
      "maps, and identity on ASCII for all ASCII-compatible labels") {
    import spark.implicits._
    import graft.operators.Charsets
    val phrases = Map(
      "windows-1251" -> "Привет мир — тест",
      "shift_jis" -> "こんにちは世界",
      "gbk" -> "你好，世界",
      "windows-1252" -> "café — naïve résumé",
      "utf-8" -> "mixed Привет café 你好")
    // label → the charset the engine actually decodes it as (WHATWG)
    val encodeAs = Map("iso-8859-1" -> "windows-1252",
      "latin1" -> "windows-1252", "gb2312" -> "GBK")
    val labels = phrases.keys.toSeq ++ encodeAs.keys.toSeq
    val rows = labels.map { l =>
      val cs = encodeAs.getOrElse(l, l)
      val phrase = phrases.getOrElse(l,
        phrases(if (cs == "GBK") "gbk" else "windows-1252"))
      (l, phrase.getBytes(java.nio.charset.Charset.forName(cs)), phrase)
    }
    val out = rows.map { case (l, b, _) => (l, b) }.toDF("l", "b")
      .select(col("l"), Charsets.decodeCharset(col("b"), col("l")).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    rows.foreach { case (l, _, phrase) =>
      assert(out(l) == phrase, s"label $l: ${out(l)}")
    }
    // ASCII is invariant under every ASCII-compatible label (the
    // property that makes the latin-1 meta prescan sound)
    val ascii = (1L to 3L).map(s => Gen.listOfN(40, Gen.asciiPrintableChar)
      .map(_.mkString).pureApply(params, Seed(s)))
    val asciiOut = (for (a <- ascii; l <- labels)
        yield (a, l, a.getBytes("US-ASCII")))
      .toDF("a", "l", "b")
      .select(col("a"), col("l"),
        Charsets.decodeCharset(col("b"), col("l")).as("t"))
      .collect()
    asciiOut.foreach { r =>
      assert(r.getString(2) == r.getString(0),
        s"ascii not invariant under ${r.getString(1)}")
    }
  }
}
