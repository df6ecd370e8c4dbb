package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Layout, Linkage, Retrieval}

/** Behavioral pins for the round-9 modules: BM25/RRF retrieval, Z-order
  * layout + zone-map pruning, and blocked entity resolution. Each algorithm
  * is checked against hand-computed expectations on tiny data plus the
  * structural invariants the battery entries rely on.
  */
class RetrievalLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  // ---- BM25 --------------------------------------------------------------

  test("BM25 matches the hand-computed Okapi score on a 3-doc corpus") {
    // corpus: dl = 4, 4, 2; query term "x": df=2 (docs 0,1), tf = 2, 1
    val docs = Seq(
      (0L, "x x y z"),
      (1L, "x y y z"),
      (2L, "y z")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, queries = Seq(1 -> Seq("x")), k = 3)
      .orderBy(col("rank")).collect()
    // idf = ln(1 + (3 - 2 + .5)/(2 + .5)); avgdl = 10/3
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def w(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (10.0 / 3.0)))
    // doc 0 (tf=2) must outrank doc 1 (tf=1); doc 2 has no hit at all
    assert(got.map(_.getLong(1)).toSeq === Seq(0L, 1L))
    assert(w(2, 4) > w(1, 4))
  }

  test("BM25 rare-term query ranks a 'dup'-bearing document first") {
    val docs = graft.Tables(spark, dir, "documents")
    val top = Retrieval.bm25TopK(docs).filter(col("query_id") === 1)
      .orderBy(col("rank")).limit(1)
      .join(docs, "doc_id").select(col("text")).head.getString(0)
    assert(top.split("\\s+").contains("dup"), top.take(120))
  }

  // ---- RRF ---------------------------------------------------------------

  test("RRF fusion emits exactly k dense ranks per query, 1..k") {
    val fused = Retrieval.rrfFuseTopK(graft.Tables(spark, dir, "embeddings"), k = 10)
    val perQ = fused.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n"), min(col("fused_rank")).as("lo"),
        max(col("fused_rank")).as("hi"),
        countDistinct(col("fused_rank")).as("d"))
      .collect()
    assert(perQ.nonEmpty)
    perQ.foreach { r =>
      assert(r.getAs[Long]("n") === 10L)
      assert(r.getAs[Long]("lo") === 1L && r.getAs[Long]("hi") === 10L)
      assert(r.getAs[Long]("d") === 10L)
    }
  }

  test("RRF: an item ranked 1 by both arms is fused rank 1") {
    // cosine rank 1 and L2 rank 1 give the maximal possible RRF mass
    // 2/(c+1); any other item has at best 1/(c+1) + 1/(c+2) < 2/(c+1).
    // Verify on the real corpus: whenever some item tops both arms, the
    // fused winner is that item. (Arms can disagree — then no claim.)
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFns
    val e = graft.Tables(spark, dir, "embeddings")
    val dim = graft.Tables.EmbeddingDim
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val dot = VectorFns.dotN(col("q_emb"), col("embedding"), dim)
    val qq = VectorFns.l2normN(col("q_emb"), dim)
    val ee = VectorFns.l2normN(col("embedding"), dim)
    val pairs = e.select(col("vec_id"), col("embedding"))
      .join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dot / (qq * ee)).as("cos"),
        (qq * qq + ee * ee - lit(2.0) * dot).as("l2sq"))
    val wCos = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val wL2 = Window.partitionBy(col("q_id"))
      .orderBy(col("l2sq").asc, col("vec_id"))
    // items that top BOTH arms for their query
    val bothTop = pairs
      .withColumn("rc", row_number().over(wCos))
      .withColumn("rl", row_number().over(wL2))
      .filter(col("rc") === 1 && col("rl") === 1)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused1 = Retrieval.rrfFuseTopK(e, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused1.nonEmpty) // structural: one winner per query
    // the property must be exercised, not vacuous: on unit-scale random
    // embeddings the arms agree at rank 1 for most queries
    assert(bothTop.nonEmpty,
      "no query had the same arm-1 item — property untested on this corpus")
    bothTop.foreach { case (qid, vid) =>
      assert(fused1(qid) === vid,
        s"query $qid: arms agree on $vid but fused rank-1 is ${fused1(qid)}")
    }
  }

  // ---- Layout ------------------------------------------------------------

  test("Morton key interleaves bits (known values, incl. beyond 16 bits)") {
    val got = spark.range(1)
      .select(
        Layout.mortonKey(lit(3L), lit(5L)).as("a"),
        Layout.mortonKey(lit(65535L), lit(0L)).as("b"),
        Layout.mortonKey(lit(0L), lit(65535L)).as("c"),
        Layout.mortonKey(lit(0L), lit(0L)).as("d"),
        // 31-bit budget: keys past 65535 must NOT alias (the 16-bit spread
        // mapped 65536 → 0)
        Layout.mortonKey(lit(1L << 20), lit(0L)).as("e"),
        Layout.mortonKey(lit(0x7FFFFFFFL), lit(0x7FFFFFFFL)).as("f"))
      .head
    assert(got.getLong(0) === 39L)          // 3=0b11→0b0101, 5=0b101→0b010001
    assert(got.getLong(1) === 0x55555555L)  // x fills even bits
    assert(got.getLong(2) === 0xAAAAAAAAL)  // y fills odd bits
    assert(got.getLong(3) === 0L)
    assert(got.getLong(4) === (1L << 40))   // bit 20 of x lands at bit 40
    assert(got.getLong(5) === 0x3FFFFFFFFFFFFFFFL) // max key stays positive
  }

  test("Z-order zone maps prune a box predicate harder than arrival order") {
    val li = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
    val zOrder = Seq(Layout.mortonKey(col("l_partkey"), col("l_suppkey")),
      col("l_orderkey"), col("l_linenumber"))
    val zm = Layout.zoneMap(li, zOrder, 256, "l_partkey", "l_suppkey")
    val lin = Layout.zoneMap(li, Seq(col("l_orderkey"), col("l_linenumber")),
      256, "l_partkey", "l_suppkey")
    // size the box to this sf's key domain (sf0.001 has ~200 parts/10 supps)
    val m = li.agg(max(col("l_partkey")).as("p"), max(col("l_suppkey")).as("s")).head
    val (x1, x2) = (m.getLong(0) / 10, m.getLong(0) / 5)
    val (y1, y2) = (m.getLong(1) / 10, m.getLong(1) / 2)
    val matching = li.filter(col("l_partkey").between(x1, x2) &&
      col("l_suppkey").between(y1, y2)).count()
    assert(matching > 0, s"empty box [$x1,$x2]x[$y1,$y2]")
    val r = Layout.pruneCompare(Map("zorder" -> zm, "linear" -> lin),
        matching, x1, x2, y1, y2)
      .collect().map(x => x.getString(0) -> x).toMap
    val (zs, ls) = (r("zorder").getAs[Long]("files_scanned"),
      r("linear").getAs[Long]("files_scanned"))
    assert(zs < ls, s"zorder=$zs linear=$ls")
    // pruning must never lose rows: scanned files cover all matches
    assert(r("zorder").getAs[Long]("rows_scanned") >= matching)
  }

  test("Hilbert zone maps prune the box at least as hard as Z-order, never losing rows") {
    // the curve-choice claim the battery entry prices: Hilbert's strict
    // cell adjacency gives a curve-position range a tighter bounding box
    // than Morton's Z jumps, so the same box predicate scans ≤ files at
    // the same file size (measured 2 vs 4 at sf0.01, 1 vs 2 at sf0.1 on
    // the battery geometry; this pin uses the sf-scaled box of the
    // zorder-vs-linear test). Deterministic data ⇒ a stable pin.
    val li = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
    val hOrder = Seq(Layout.hilbertKey(col("l_partkey"), col("l_suppkey"), 20),
      col("l_orderkey"), col("l_linenumber"))
    val zOrder = Seq(Layout.mortonKey(col("l_partkey"), col("l_suppkey")),
      col("l_orderkey"), col("l_linenumber"))
    val zmH = Layout.zoneMap(li, hOrder, 256, "l_partkey", "l_suppkey")
    val zmZ = Layout.zoneMap(li, zOrder, 256, "l_partkey", "l_suppkey")
    val m = li.agg(max(col("l_partkey")).as("p"), max(col("l_suppkey")).as("s")).head
    val (x1, x2) = (m.getLong(0) / 10, m.getLong(0) / 5)
    val (y1, y2) = (m.getLong(1) / 10, m.getLong(1) / 2)
    val matching = li.filter(col("l_partkey").between(x1, x2) &&
      col("l_suppkey").between(y1, y2)).count()
    val r = Layout.pruneCompare(Map("hilbert" -> zmH, "zorder" -> zmZ),
        matching, x1, x2, y1, y2)
      .collect().map(x => x.getString(0) -> x).toMap
    val (hs, zs) = (r("hilbert").getAs[Long]("files_scanned"),
      r("zorder").getAs[Long]("files_scanned"))
    assert(hs <= zs, s"hilbert=$hs zorder=$zs")
    assert(r("hilbert").getAs[Long]("rows_scanned") >= matching,
      "Hilbert pruning lost matching rows")
  }

  test("writeZOrdered range-partitions: per-file z ranges do not overlap") {
    val out = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val li = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    Layout.writeZOrdered(li, out, "l_partkey", "l_suppkey", targetFiles = 4)
    val back = spark.read.parquet(out)
      .withColumn("z", Layout.mortonKey(col("l_partkey"), col("l_suppkey")))
      .withColumn("f", input_file_name())
      .groupBy(col("f")).agg(min(col("z")).as("lo"), max(col("z")).as("hi"))
      .orderBy(col("lo")).collect()
    assert(back.length >= 2)
    back.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
        s"overlapping z ranges: $a vs $b")
    case _ => ()
    }
    // production pruning loop: zone maps of the REAL files price a box
    // predicate; scanned files must cover every matching row and Z-order
    // must skip at least one file
    val zmFiles = Layout.zoneMapOfFiles(spark, out, "l_partkey", "l_suppkey")
      .withColumnRenamed("file", "file_id")
    val m = li.agg(max(col("l_partkey")), max(col("l_suppkey"))).head
    val (x2, y2) = (m.getLong(0) / 8, m.getLong(1) / 4)
    val matching = li.filter(col("l_partkey").between(0, x2) &&
      col("l_suppkey").between(0, y2)).count()
    val priced = Layout.pruneCompare(Map("real" -> zmFiles), matching,
      0, x2, 0, y2).head
    assert(priced.getAs[Long]("files_scanned") < priced.getAs[Long]("n_files"),
      priced)
    assert(priced.getAs[Long]("rows_scanned") >= matching, priced)
  }

  // ---- Compaction --------------------------------------------------------

  test("compactFiles: byte-sized planning, content identity, bounded fragmentation") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact-spec").toString
    val li = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    li.repartition(32, col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$base/small")

    def partFiles(p: String): Seq[java.io.File] =
      new java.io.File(p).listFiles.toSeq
        .filter(f => f.isFile && f.getName.startsWith("part-"))

    val smallFiles = partFiles(s"$base/small")
    val bytes = smallFiles.map(_.length).sum
    val target = bytes / 5 + 1
    val n = Layout.compactFiles(spark, s"$base/small", s"$base/compact", target)
    assert(n === ((bytes + target - 1) / target).toInt, "planned count formula")
    val compFiles = partFiles(s"$base/compact")
    // greedy whole-file packing: at least the planned count, at most ~2x,
    // and strictly fewer files than the fragmented input
    assert(compFiles.length >= n && compFiles.length <= 2 * n + 1,
      s"planned $n, got ${compFiles.length}")
    assert(compFiles.length < smallFiles.length)
    // content identity in both directions — compaction is a content no-op
    val back = spark.read.parquet(s"$base/compact")
    assert(back.exceptAll(li).count() === 0L)
    assert(li.exceptAll(back).count() === 0L)
  }

  test("compactFiles order mode restores disjoint per-file cluster-key ranges") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact-ord").toString
    val li = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    // fragmented AND key-interleaved, the post-append state of a clustered table
    li.repartition(32, col("l_partkey"))
      .write.mode("overwrite").parquet(s"$base/small")
    val bytes = new java.io.File(s"$base/small").listFiles.toSeq
      .filter(f => f.isFile && f.getName.startsWith("part-")).map(_.length).sum
    Layout.compactFiles(spark, s"$base/small", s"$base/ordered", bytes / 4 + 1,
      orderCol = Some("l_orderkey"))
    val ranges = Layout.zoneMapOfFiles(spark, s"$base/ordered",
      "l_orderkey", "l_partkey")
      .orderBy(col("min_x")).collect()
    assert(ranges.length >= 2, "order mode produced a single file")
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_x") <= b.getAs[Long]("min_x"),
          s"overlapping key ranges after ordered compaction: $a vs $b")
      case _ => ()
    }
    assert(spark.read.parquet(s"$base/ordered").count() === li.count())
  }

  // ---- Entity resolution -------------------------------------------------

  test("blocked matches stay within blocks, ordered, and under the threshold") {
    val ents = Linkage.entities(graft.Tables(spark, dir, "part"), "p_name", "p_partkey")
    val m = Linkage.blockedMatches(ents, split(col("name"), " ").getItem(1), maxLev = 2)
      .collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val (a, b) = (r.getAs[String]("name_a"), r.getAs[String]("name_b"))
      assert(a < b)
      assert(a.split(" ")(1) === b.split(" ")(1), s"cross-block pair $a|$b")
      assert(r.getAs[Int]("lev") <= 2)
    }
  }

  test("NULL names never enter the entity set (engine/oracle alignment)") {
    // the Spark block key coalesces NULL splits to '' while DuckDB's
    // split_part drops NULLs from the equi-join — entities() filters the
    // NULL name so neither engine ever sees it
    import spark.implicits._
    val src = Seq((1L, "cold bolt"), (2L, null.asInstanceOf[String]),
      (3L, "old bolt")).toDF("p_partkey", "p_name")
    val ents = Linkage.entities(src, "p_name", "p_partkey")
    assert(ents.filter(col("name").isNull).count() === 0L)
    assert(ents.count() === 2L)
    val resolved = Linkage.resolveEntities(ents,
      coalesce(split(col("name"), " ").getItem(1), lit("")), maxLev = 2)
    assert(resolved.count() === 2L)
  }

  test("resolution is transitive: cold/old variants share one canonical key") {
    val ents = Linkage.entities(graft.Tables(spark, dir, "part"), "p_name", "p_partkey")
    val resolved = Linkage.resolveEntities(ents,
        split(col("name"), " ").getItem(1), maxLev = 2)
      .collect().map(r => r.getAs[String]("name") -> r.getAs[Long]("canonical_key")).toMap
    val nouns = resolved.keySet.map(_.split(" ")(1))
    nouns.foreach { n =>
      // cold↔old are lev-1; old↔red and new↔red are lev-2 ⇒ one cluster
      val family = Seq(s"cold $n", s"old $n", s"new $n", s"red $n")
        .filter(resolved.contains)
      if (family.length > 1)
        assert(family.map(resolved).distinct.size === 1,
          s"family $family split: ${family.map(resolved)}")
    }
    // an unmatched entity is its own canonical
    val ekeys = ents.collect().map(r => r.getAs[String]("name") -> r.getAs[Long]("entity_key")).toMap
    resolved.foreach { case (name, canon) =>
      assert(canon <= ekeys(name), s"$name canonical above own key")
    }
  }

  test("goldenRecords: support-winner name, lexicographic tie, field merge rules") {
    import spark.implicits._
    // cluster 1 = three members (two tied on support), cluster 7 = singleton
    val resolved = Seq(
      ("alpha bolt", 1L, 1L, 5L), ("alphq bolt", 2L, 1L, 9L),
      ("beta bolt", 3L, 1L, 9L), ("zinc cog", 7L, 7L, 2L)
    ).toDF("name", "entity_key", "canonical_key", "n_rows")
    val attrs = Seq((1L, 10.0, 3), (2L, 20.0, 1), (3L, 15.0, 9), (7L, 9.0, 2))
      .toDF("entity_key", "p_retailprice", "p_size")
    val out = Linkage.goldenRecords(resolved, attrs,
        Seq(max(col("p_retailprice")).as("max_price"),
          max(col("p_size")).as("max_size")))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4),
          r.getString(5)))).toMap
    // support tie 9 = 9 breaks lexicographically: "alphq bolt" < "beta bolt";
    // max_price and max_size survive from DIFFERENT members (field-level merge)
    assert(out(1L) === ((3L, 23L, 20.0, 9, "alphq bolt")))
    assert(out(7L) === ((1L, 2L, 9.0, 2, "zinc cog")))
  }

  test("bloom index: inserted keys always hit; pruning skips most files on a clustered layout") {
    val dir = java.nio.file.Files.createTempDirectory("bloom-spec").toString
    val out = s"$dir/layout"
    // 8 range files over a key-ordered layout: key k lives only in file k/250
    Seq.tabulate(2000)(i => (i.toLong, s"payload-$i"))
      .toDF("k", "v")
      .repartitionByRange(8, col("k")).sortWithinPartitions(col("k"))
      .write.mode("overwrite").parquet(out)
    val idx = Layout.bloomIndexOfFiles(spark, out, "k",
      expectedPerFile = 512, fpp = 0.01)
    assert(idx.count() === 8L)
    // membership: every probed present key comes back exactly once, with its row
    val probe = Seq(0L, 999L, 1999L)
    val pr = Layout.bloomPrunedRead(spark, out, idx, "k", probe)
    val rows = pr.data.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === probe.sorted.map(k => (k, s"payload-$k")))
    // pruning: 3 keys live in 3 distinct files; fpp-driven false positives
    // are possible but 8 -> <= 5 skips the layout on any plausible draw
    assert(pr.filesTotal === 8L)
    assert(pr.filesRead >= 3L && pr.filesRead <= 5L,
      s"expected ~3 files read, got ${pr.filesRead}")
    // an absent key yields zero rows (false positives cost scans, never rows)
    val none = Layout.bloomPrunedRead(spark, out, idx, "k", Seq(123456789L))
    assert(none.data.count() === 0L)
  }

  test("bloomPruneInvariants: clean run is all-green at sf0.001") {
    val row = Layout.bloomPruneInvariants(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("rows_found") > 0L)
    assert(row.getAs[Long]("missed_rows") === 0L)
    assert(row.getAs[Long]("pruned_ok") === 1L)
  }

  test("bloomIndexAppend: delta-only maintenance is indistinguishable from a rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("bloom-append").toString
    val out = s"$dir/layout"
    Seq.tabulate(900)(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(3, col("k")).sortWithinPartitions(col("k"))
      .write.mode("overwrite").parquet(out)
    val base = Layout.bloomIndexOfFiles(spark, out, "k", 512, 0.01).localCheckpoint()
    // no new files: append returns the existing index untouched
    assert(Layout.bloomIndexAppend(spark, out, base, "k", 512, 0.01).count() === 3L)
    // append a batch, maintain incrementally, compare against a rebuild
    Seq.tabulate(300)(i => ((900 + i).toLong, s"w$i")).toDF("k", "v")
      .repartition(2).write.mode("append").parquet(out)
    val inc = Layout.bloomIndexAppend(spark, out, base, "k", 512, 0.01)
    val full = Layout.bloomIndexOfFiles(spark, out, "k", 512, 0.01)
    assert(inc.count() === 5L && full.count() === 5L)
    def sig(df: org.apache.spark.sql.DataFrame) = df
      .select(element_at(split(col("file"), "/"), -1).as("f"), col("n_rows"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(sig(inc) === sig(full))
    // probes through the incremental index see both old and new keys
    val pr = Layout.bloomPrunedRead(spark, out, inc, "k", Seq(0L, 1199L))
    assert(pr.data.count() === 2L)
    // a self-healing property: a file row DROPPED from the base index is
    // simply re-indexed by the delta pass (not silently lost)
    val healed = Layout.bloomIndexAppend(spark, out,
      base.orderBy("file").limit(2), "k", 512, 0.01)
    assert(sig(healed) === sig(full))
  }

  test("phraseMatches: anchor alignment — order, adjacency, overlap, repeats") {
    import graft.operators.Retrieval
    val d = Seq(
      (1L, "a b c a b c"),        // "a b" twice; "b a" once (positions 1-2)
      (2L, "b a b"),              // "a b" once at 1; "b a" once at 0
      (3L, "a a a"),              // repeated-term phrase "a a" overlaps: 2
      (4L, "a c b"),              // terms present but NOT adjacent → no match
      (5L, "x y z")               // no terms at all
    ).toDF("doc_id", "text")
    def rows(p: Seq[String]) =
      Retrieval.phraseMatches(d, p).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows(Seq("a", "b")) === Seq((1L, 2L, 0L), (2L, 1L, 1L)))
    // "b a": doc 1 never has them adjacent (b is always followed by c)
    assert(rows(Seq("b", "a")) === Seq((2L, 1L, 0L)))
    // overlapping occurrences of a repeated-term phrase both count
    assert(rows(Seq("a", "a")) === Seq((3L, 2L, 0L)))
    // 3-term phrase exercises the full join chain
    assert(rows(Seq("a", "b", "c")) === Seq((1L, 2L, 0L)))
    assert(rows(Seq("c", "a", "b")) === Seq((1L, 1L, 2L)))
  }
}
