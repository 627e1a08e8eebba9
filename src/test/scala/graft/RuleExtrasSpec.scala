package graft

import graft.rules._
import graft.text.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Specs for denial constraints (J4), trained thresholds (A18),
  * dictionary membership (P8), OOV tokens (P9 stand-in) and typo pairs
  * (F12). */
class RuleExtrasSpec extends SparkSpec {

  test("FD discovery finds the planted dependency and rejects noise") {
    import spark.implicits._
    // b -> m is exact (brand digit encodes mfgr); s is random noise;
    // k is near-unique (screened out as LHS); c is constant (screened
    // out as RHS and LHS)
    val rows = (1 to 200).map { i =>
      val m = i % 4
      (i.toLong, s"M$m", s"B$m${i % 8}", i % 3, "const")
    }
    val df = rows.toDF("k", "m", "b", "s", "c")
    val stats = RuleGenerator.discoverFds(df, Seq("k", "m", "b", "s", "c"),
      maxLhsDistinctRatio = 0.5, maxConflictRatio = 0.05)
    val holds = stats.filter(org.apache.spark.sql.functions.col("holds"))
      .select("lhs_col", "rhs_col").as[(String, String)].collect().toSet
    assert(holds === Set("b" -> "m"))
    // k (near-unique) never appears as LHS; c never appears at all
    val seen = stats.select("lhs_col", "rhs_col")
      .as[(String, String)].collect().toSet
    assert(!seen.exists(_._1 == "k"))
    assert(!seen.exists(p => p._1 == "c" || p._2 == "c"))
    // the b -> m stats are exact
    val r = stats.filter("lhs_col = 'b' AND rhs_col = 'm'").collect().head
    assert(r.getAs[Long]("conflict_rows") == 0L)
    assert(r.getAs[Double]("confidence") == 1.0)
    // generated rules round-trip through the serde and scan clean
    val rules = RuleGenerator.discoveredFdRules(stats)
    assert(rules == Seq(FunctionalDependencyRule("b", "m")))
    assert(RuleSerde.fromJson(RuleSerde.toJson(rules)) == rules)
    val viol = ViolationScanner.scan(df, "t", rules, "k")
    assert(viol.count() == 0L)
  }

  test("key discovery: singles, minimal pairs, null/duplicate accounting") {
    import spark.implicits._
    // id unique (single key); (hi, lo) a planted minimal composite key;
    // cat low-cardinality; nul carries a null (disqualified even though
    // its non-null values are distinct)
    val rows = (0 until 60).map { i =>
      (i.toLong, (i / 8).toLong, (i % 8).toLong, s"c${i % 3}",
        if (i == 7) null else s"v$i")
    }
    val df = rows.toDF("id", "hi", "lo", "cat", "nul")
    val cols = Seq("id", "hi", "lo", "cat", "nul")
    val stats = RuleGenerator.discoverKeys(df, cols)
    val byKey = stats.collect().map(r => r.getAs[String]("key_cols") -> r).toMap
    assert(byKey("id").getAs[Boolean]("holds"))
    assert(byKey("hi,lo").getAs[Boolean]("holds"))
    assert(!byKey("cat").getAs[Boolean]("holds"))
    // null accounting: nul has 59 non-null distinct values but 60 rows
    val nul = byKey("nul")
    assert(!nul.getAs[Boolean]("holds"))
    assert(nul.getAs[Long]("n_nonnull") == 59L)
    assert(nul.getAs[Long]("n_duplicate_rows") == 0L)
    // minimality: no pair contains the holding single `id`
    assert(!byKey.keys.exists(k => k != "id" && k.split(',').contains("id")))
    // duplicate accounting on a failing pair: (hi, cat) collides
    assert(byKey("hi,cat").getAs[Long]("n_duplicate_rows") > 0L)
    // rule emission + serde round trip
    val rules = RuleGenerator.discoveredKeyRules(stats)
    assert(rules.toSet ==
      Set(UniqueRule("id"), CompositeUniqueRule(Seq("hi", "lo"))))
    assert(RuleSerde.fromJson(RuleSerde.toJson(rules)) == rules)
  }

  test("source blocklist: stats, decision, scannable rules") {
    import spark.implicits._
    val good = "The quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet meadow toward the river bank. " * 4
    val shortDoc = "tiny"
    val junk = "@@@@ #### 1234 5678 !!!! %%%% 9999 0000 &&&& ****"
    val docs = (
      (1 to 10).map(i => (i.toLong, "clean", good)) ++
      (11 to 20).map(i => (i.toLong, "shorty", if (i <= 16) shortDoc else good)) ++
      (21 to 30).map(i => (i.toLong, "junky", junk))
    ).toDF("doc_id", "source", "text")
    val stats = CorpusRules.sourceStats(docs, "source", "text",
      minAvgQuality = 0.6, maxShortFrac = 0.5)
    val byS = stats.collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(!byS("clean").getAs[Boolean]("blocked"))
    assert(byS("shorty").getAs[Boolean]("blocked")) // 6/10 short > 0.5
    assert(byS("junky").getAs[Boolean]("blocked")) // punct/digit-heavy
    assert(byS("clean").getAs[Long]("n_docs") == 10L)
    // rules: one predicate per blocked source, sorted, serde-stable
    val rules = CorpusRules.blocklistRules(stats)
    assert(rules.map(_.ruleName) ==
      Seq("source_block(junky)", "source_block(shorty)"))
    assert(RuleSerde.fromJson(RuleSerde.toJson(rules)) == rules)
    // a violation scan flags exactly the blocked sources' documents
    val viol = ViolationScanner.scan(docs, "docs", rules, "doc_id")
    assert(viol.count() == 20L)
  }

  test("constant CFD discovery finds conditional bindings, emits scannable rules") {
    import spark.implicits._
    // k=a: always x (binding, support 20). k=b: 19×y, 1×z (conf 0.95).
    // k=c: 10×x, 10×y (tie → larger string y, conf 0.5 → dropped).
    // k=d: support 5 < minSupport → dropped even though pure.
    val rows =
      (1 to 20).map(i => (i.toLong, "a", "x")) ++
      (21 to 40).map(i => (i.toLong, "b", if (i == 40) "z" else "y")) ++
      (41 to 60).map(i => (i.toLong, "c", if (i % 2 == 0) "x" else "y")) ++
      (61 to 65).map(i => (i.toLong, "d", "w"))
    val df = rows.toDF("id", "k", "v")
    val got = RuleGenerator.discoverConstantCfds(df, Seq("k" -> "v"),
      minSupport = 10L, minConfidence = 0.9)
    val byVal = got.collect().map(r => r.getAs[String]("lhs_val") ->
      ((r.getAs[String]("rhs_val"), r.getAs[Long]("support"),
        r.getAs[Long]("n_rhs"), r.getAs[Double]("confidence")))).toMap
    assert(byVal.keySet === Set("a", "b"))
    assert(byVal("a") === (("x", 20L, 1L, 1.0)))
    assert(byVal("b") === (("y", 20L, 2L, 0.95)))
    // ties break deterministically to the larger rhs string
    val tied = RuleGenerator.discoverConstantCfds(df, Seq("k" -> "v"),
        minSupport = 10L, minConfidence = 0.0)
      .filter("lhs_val = 'c'").collect().head
    assert(tied.getAs[String]("rhs_val") == "y")
    // emitted rules scan: violations are exactly the pattern-matching
    // rows that break the binding (the one b→z row)
    val rules = RuleGenerator.conditionalRules(got)
    assert(rules.map(_.ruleName) ==
      Seq("cfd(k='a'->v='x')", "cfd(k='b'->v='y')"))
    assert(RuleSerde.fromJson(RuleSerde.toJson(rules)) == rules)
    val viol = ViolationScanner.scan(df, "t", rules, "id")
    assert(viol.select("row_id").as[Long].collect().toSeq == Seq(40L))
  }

  test("IND discovery finds planted FKs, flags key parents, emits rules") {
    import spark.implicits._
    // dim(dk unique 1..10, dupes in name); fact.fk ⊆ dim.dk (FK);
    // fact.part covers only half the dim keys (coverage 0.5);
    // dim.dk ⊄ fact.fk (fact uses only keys 1..8)
    val dim = (1 to 10).map(i => (i.toLong, s"n${i % 3}")).toDF("dk", "dname")
    val fact = (1 to 40).map(i => (i.toLong, (i % 8 + 1).toLong, (i % 5 + 1).toLong))
      .toDF("id", "fk", "part")
    val stats = RuleGenerator.discoverInds(Seq(
      ("dim", dim, Seq("dk", "dname")), ("fact", fact, Seq("fk", "part"))))
    def row(ct: String, cc: String, pt: String, pc: String) =
      stats.filter(s"child_table = '$ct' AND child_column = '$cc' AND " +
        s"parent_table = '$pt' AND parent_column = '$pc'").collect().headOption
    val fkRow = row("fact", "fk", "dim", "dk").get
    assert(fkRow.getAs[Boolean]("holds") && fkRow.getAs[Boolean]("parent_is_key"))
    assert(fkRow.getAs[Long]("shared_distinct") == 8L)
    // reverse direction: dim.dk has 10 values, only 8 shared → not held
    val rev = row("dim", "dk", "fact", "fk").get
    assert(!rev.getAs[Boolean]("holds"))
    assert(rev.getAs[Double]("coverage") == 0.8)
    // part ⊆ dk holds but so does part ⊆ fk (coincidental containment)
    assert(row("fact", "part", "dim", "dk").get.getAs[Boolean]("holds"))
    // dname never matches numeric values: no pair rows at all
    assert(stats.filter("child_column = 'dname' OR parent_column = 'dname'")
      .count() == 0L)
    // rule emission: key parents only, cross-table only, serde round-trip
    val rules = RuleGenerator.discoveredInclusionRules(stats)
    assert(rules.contains(InclusionRule("fk", "dim", "dk")))
    assert(rules.forall(r => r.parentTable == "dim"))
    assert(RuleSerde.fromJson(RuleSerde.toJson(rules)) == rules)
    graft.ops.StagePersists.release(spark)
  }

  test("denial constraint parsing") {
    val dc = DenialConstraints.parse(
      "t1&t2&EQ(t1.ZipCode,t2.ZipCode)&IQ(t1.City,t2.City)")
    assert(dc.predicates === Seq(
      DCPredicate("EQ", "ZipCode", "ZipCode"), DCPredicate("IQ", "City", "City")))
    assert(dc.eqPredicates.size === 1)
    assertThrows[IllegalArgumentException](DenialConstraints.parse("t1&t2"))
  }

  test("denial constraint violations — EQ+IQ") {
    import spark.implicits._
    val df = Seq(
      (1L, "02139", "Cambridge"), (2L, "02139", "Cambridge"),
      (3L, "02139", "Boston"), (4L, "10001", "NYC")).toDF("id", "zip", "city")
    val dc = DenialConstraints.parse("t1&t2&EQ(t1.zip,t2.zip)&IQ(t1.city,t2.city)")
    val rows = DenialConstraints.violatingRows(df, dc, "id")
      .collect().map(_.getLong(0)).sorted
    // 1,2 agree; 3 conflicts with both; 4 alone
    assert(rows === Array(1L, 2L, 3L))
  }

  test("denial constraint violations — asymmetric GT keeps both sides") {
    import spark.implicits._
    val df = Seq((1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 1.0))
      .toDF("id", "k", "x")
    val dc = DenialConstraints.parse("t1&t2&EQ(t1.k,t2.k)&GT(t1.x,t2.x)")
    val rows = DenialConstraints.violatingRows(df, dc, "id")
      .collect().map(_.getLong(0)).sorted
    assert(rows === Array(1L, 2L))
  }

  test("trained threshold bands and scan") {
    import spark.implicits._
    // 1..100: p05 ≈ 5.95, p95 ≈ 95.05 (interpolated)
    val clean = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val bands = TrainedRules.thresholdBands(clean, Seq("x")).collect().head
    assert(math.abs(bands.getAs[Double]("p05") - 5.95) < 1e-9)
    assert(math.abs(bands.getAs[Double]("p95") - 95.05) < 1e-9)
    assert(math.abs(bands.getAs[Double]("mean") - 50.5) < 1e-9)
    val v = TrainedRules.fitAndScan(clean, clean, "t", Seq("x"), "id")
      .select("row_id").collect().map(_.getLong(0)).sorted
    assert(v === ((1L to 5L) ++ (96L to 100L)).toArray)
  }

  test("fixed-point threshold bands match the decimal moments") {
    // the Long moment kernel must agree with the Decimal reference at
    // the gate's rounding on real money columns
    import org.apache.spark.sql.functions.{col, round}
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    def rows(fp: Option[Int]) =
      TrainedRules.thresholdBands(li, cols, fixedPointDecimals = fp)
        .select(col("column"), round(col("p05"), 6), round(col("p95"), 6),
          round(col("mean"), 6), round(col("std"), 6))
        .orderBy("column").collect().toSeq
    assert(rows(Some(2)) === rows(None))
  }

  test("dictionary normalization and misses") {
    import spark.implicits._
    val dict = Seq("Saint Louis", "Mount Vernon", "Boston").toDF("name")
    val probe = Seq("st. louis", "MT VERNON", "boston", "springfield", "")
      .toDF("city")
    val misses = Dictionary.misses(probe, "city", dict, "name")
      .collect().map(_.getString(0))
    assert(misses === Array("springfield"))
  }

  test("oov tokens") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog"))
      .toDF("doc_id", "text")
    val oov = TextAnalysis.oovTokens(docs, "text", "doc_id", minDocFreq = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(oov === Map("sat" -> 1L, "ran" -> 1L, "dog" -> 1L))
  }

  test("typo pairs") {
    import spark.implicits._
    val df = Seq("Chicago", "Chicag0", "Chicagoo", "Boston").toDF("city")
    val pairs = TextAnalysis.typoPairs(df, "city", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(pairs === Set(
      ("Chicag0", "Chicago", 1), ("Chicag0", "Chicagoo", 2),
      ("Chicago", "Chicagoo", 1)))
    assertThrows[IllegalArgumentException](
      TextAnalysis.typoPairs(df, "city", maxDist = 1, maxDistinct = 2))
  }

  test("composite unique scan flags tuple duplicates, not column-wise ones") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "x"),   // duplicate (a,x) tuple
      (3L, "a", "y"), (4L, "b", "x"),   // column values repeat, tuples don't
      (5L, null.asInstanceOf[String], "z"), (6L, null, "z")) // NULLs group
      .toDF("id", "u", "v")
    val hits = ViolationScanner.scan(df, "t",
        Seq(CompositeUniqueRule(Seq("u", "v"))), "id")
      .select("row_id", "value").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hits === Map(1L -> "a,x", 2L -> "a,x", 5L -> ",z", 6L -> ",z"))
  }

  test("composite unique keys do not collide through concatenation") {
    import spark.implicits._
    // ("a,b","c") and ("a","b,c") concatenate identically; they are
    // DIFFERENT tuples and each occurs once → zero violations
    val df = Seq((1L, "a,b", "c"), (2L, "a", "b,c")).toDF("id", "u", "v")
    val n = ViolationScanner.scan(df, "t",
      Seq(CompositeUniqueRule(Seq("u", "v"))), "id").count()
    assert(n === 0L)
  }

  test("composite unique scan survives hostile column names") {
    import spark.implicits._
    // table columns named like the scan's working columns
    val df = Seq((1L, "a", "a"), (2L, "a", "a"), (3L, "b", "c"))
      .toDF("row_id", "value", "n")
    val hits = ViolationScanner.scan(df, "t",
        Seq(CompositeUniqueRule(Seq("value", "n"))), "row_id")
      .select("row_id").collect().map(_.getLong(0)).sorted
    assert(hits === Array(1L, 2L))
  }

  test("profile, generate, and scan survive dots and spaces in names") {
    import spark.implicits._
    // real lakes carry CSV headers like "a.b" and "c d" — the whole
    // pipeline must treat them as plain names, never as field paths
    val df = Seq((1L, "x", 5.0), (2L, null, 6.0), (3L, "z", 700.0))
      .toDF("id", "a.b", "c d")
    val prof = graft.profile.Profiler.profile(df, "t")
    assert(prof.select("column").collect().map(_.getString(0)).toSet ===
      Set("id", "a.b", "c d"))
    val rules = RuleGenerator.fromProfiles(prof)
    assert(rules.exists(_.name == "regex(a.b)"))
    assert(rules.exists(_.name == "range(c d)"))
    val out = ViolationScanner.scan(df, "t",
        Seq(NotNullRule("a.b"), RangeRule("c d", 0, 10),
          UniqueRule("a.b"), CompositeUniqueRule(Seq("a.b", "c d")),
          FunctionalDependencyRule("a.b", "c d")), "id")
      .select("row_id", "rule").as[(Long, String)].collect().toSet
    assert(out === Set((2L, "not_null(a.b)"), (3L, "range(c d)")))
  }

  test("uniqueness scans aggregate+join instead of windowing (skew-safe)") {
    import spark.implicits._
    // one hot key dominating the table — a window partition would buffer
    // it in a single task; the groupBy+semi-join form must not plan a Window
    val df = ((1 to 5000).map(i => (i.toLong, "hot")) ++
      Seq((9001L, "cold"), (9002L, "cool"))).toDF("id", "k")
    val scan = ViolationScanner.scan(df, "t", Seq(UniqueRule("k")), "id")
    val plan = scan.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unique scan must not window:\n$plan")
    assert(scan.count() === 5000L)
    val comp = ViolationScanner.scan(df, "t",
      Seq(CompositeUniqueRule(Seq("k", "k"))), "id")
    val compPlan = comp.queryExecution.executedPlan.toString
    assert(!compPlan.contains("Window"),
      s"composite scan must not window:\n$compPlan")
    assert(comp.count() === 5000L)
  }

  test("composite unique serde rejects malformed columns") {
    val json = """[{"kind":"composite_unique","columns":"a,b","severity":"error"}]"""
    assertThrows[IllegalArgumentException](RuleSerde.fromJson(json))
    val json2 = """[{"kind":"composite_unique","columns":["a",3],"severity":"error"}]"""
    assertThrows[IllegalArgumentException](RuleSerde.fromJson(json2))
  }

  test("typo pairs plan is a hash join on the band key, not a nested loop") {
    import spark.implicits._
    val df = (1 to 200).map(i => s"value_$i").toDF("city")
    val plan = TextAnalysis.typoPairs(df, "city", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"typoPairs must equi-join on the length band:\n$plan")
  }
}
