package graft

import graft.eval.Metrics
import graft.ingest.Ingest
import graft.rules._
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end golden-pair harness on the reference's OWN eval data
  * (FIXTURES.md §1; reference: datasets/Quintet/hospital — 1,000×20
  * dirty/clean pair with typo-substitution errors, and
  * rules/hospital_constraints.txt denial constraints).
  *
  * Ground truth = cell-wise dirty/clean diff (reference:
  * dataset.py:56-62); headers differ between the files, so columns
  * align positionally under the clean header names.
  */
class GoldenPairSpec extends SparkSpec {

  private val dir = "/root/reference/datasets/Quintet/hospital"

  private def loadPair(): (DataFrame, DataFrame) = {
    val dirtyRaw = Ingest.readCsvStrict(spark, s"$dir/dirty.csv")
    val clean = Ingest.readCsvStrict(spark, s"$dir/clean.csv")
    // positional alignment: dirty takes clean's (canonical) header names
    val dirty = dirtyRaw.toDF(clean.columns.toIndexedSeq: _*)
    (dirty, clean)
  }

  test("ground-truth diff finds the planted typos") {
    val (dirty, clean) = loadPair()
    val actual = Metrics.actualErrorCells(dirty, clean, "index")
    val n = actual.count()
    assert(n > 100, s"expected hundreds of error cells, got $n")
    // the known typo class: x-substitutions in MeasureName
    val measureErrors = actual.filter(col("column") === "MeasureName").count()
    assert(measureErrors > 30) // 36 x-substitution typo cells in the pair
  }

  test("reference denial constraints parse and find conflicts on dirty") {
    val (dirty, _) = loadPair()
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/rules/hospital_constraints.txt")))
    val dcs = DenialConstraints.parseAll(text)
    assert(dcs.size >= 10)
    assert(dcs.forall(_.eqPredicates.nonEmpty))
    // zip→city conflicts exist in the dirty file (typos break agreement)
    val zipCity = dcs.find(_.raw.contains("t2.City")).get
    val conflicts = DenialConstraints.violatingRows(dirty, zipCity, "index").count()
    assert(conflicts > 0)
  }

  test("flights pair: time-format regex + not-null detection") {
    val fdir = "/root/reference/datasets/Quintet/flights"
    val dirtyRaw = Ingest.readCsvStrict(spark, s"$fdir/dirty.csv")
    val clean = Ingest.readCsvStrict(spark, s"$fdir/clean.csv")
    val dirty = dirtyRaw.toDF(clean.columns.toIndexedSeq: _*)
    val key = clean.columns.head // tuple_id
    val actual = Metrics.actualErrorCells(dirty, clean, key)
    assert(actual.count() > 1000) // flights is heavily dirty
    // reference rules: matches_regex_time + is_not_nullable
    // (dictionary_rule.py:35-58)
    val timeRe = "^\\d{1,2}:\\d{2}\\s?[ap]\\.m\\.$"
    val timeCols = Seq("sched_dep_time", "act_dep_time",
      "sched_arr_time", "act_arr_time")
    val rules: Seq[RuleSpec] =
      timeCols.map(c => RegexRule(c, timeRe): RuleSpec) ++
        timeCols.map(c => NotNullRule(c): RuleSpec)
    val predicted = Metrics.mergeErrors(
      ViolationScanner.scan(dirty, "flights", rules, key))
    val overall = Metrics.score(predicted, actual)
      .filter(col("column") === "__overall__").collect().head
    val recall = overall.getAs[Double]("recall")
    val precision = overall.getAs[Double]("precision")
    assert(recall > 0.3, s"recall $recall")
    assert(precision > 0.5, s"precision $precision")
  }

  test("beers pair: unit-suffix and N/A noise caught by regex rules") {
    val bdir = "/root/reference/datasets/Quintet/beers"
    val dirtyRaw = Ingest.readCsvStrict(spark, s"$bdir/dirty.csv")
    val clean = Ingest.readCsvStrict(spark, s"$bdir/clean.csv")
    val dirty = dirtyRaw.toDF(clean.columns.toIndexedSeq: _*)
    val actual = Metrics.actualErrorCells(dirty, clean, "index")
    // reference rules: matches_regex_ounces (^\d+$ integers), ibu digits
    // (dictionary_rule.py:59-72), decimal_precision on abv
    val rules: Seq[RuleSpec] = Seq(
      RegexRule("ounces", "^\\d+(\\.\\d+)?$"), // dirty holds "12.0 oz"
      RegexRule("ibu", "^\\d+$"))              // dirty holds "N/A"
    val predicted = Metrics.mergeErrors(
      ViolationScanner.scan(dirty, "beers", rules, "index"))
    val scores = Metrics.score(predicted, actual).collect()
      .map(r => r.getAs[String]("column") ->
        (r.getAs[Double]("precision"), r.getAs[Double]("recall"))).toMap
    val (op, orr) = scores("__overall__")
    assert(op > 0.5, s"overall precision $op")
    assert(orr > 0.2, s"overall recall $orr")
  }

  test("rayyan pair: format rules stay precise on rotation-style errors") {
    val rdir = "/root/reference/datasets/Quintet/rayyan"
    val dirty = Ingest.readCsvStrict(spark, s"$rdir/dirty.csv")
    val clean = Ingest.readCsvStrict(spark, s"$rdir/clean.csv")
    val actual = Metrics.actualErrorCells(dirty, clean, "id")
    assert(actual.count() > 100)
    // rayyan's created_at errors are DAY/MONTH ROTATIONS ("4/2/15" →
    // "2/15/04"): every dirty value still conforms to M/D/YY, and the
    // 87 blanks are blank in clean too. A format rule must therefore
    // flag NOTHING — zero false positives is the correct behavior
    // (value-level rotations need cross-field/reference knowledge).
    val rules: Seq[RuleSpec] = Seq(
      NotNullRule("article_jcreated_at"),
      RegexRule("article_jcreated_at", "^\\d{1,2}/\\d{1,2}/\\d{2}$"))
    val predicted = Metrics.mergeErrors(
      ViolationScanner.scan(dirty, "rayyan", rules, "id"))
    val fp = predicted.join(actual.select("row_id", "column"),
      Seq("row_id", "column"), "left_anti").count()
    val tp = predicted.count() - fp
    assert(tp === 0L, s"format rules cannot see rotations; tp=$tp")
    assert(fp <= 90L, // ~87 cells blank in dirty AND clean
      s"only clean-blank/format-quirk cells may be flagged, got $fp")
    // case/format inconsistency (eng / English / ENG) is real in the
    // data and surfaces through the low-frequency detector
    val lowFreq = graft.outlier.Outliers.lowFrequencyValues(
      dirty, "article_language", minRatio = 0.02)
      .collect().map(_.getString(0)).toSet
    assert(lowFreq.exists(v => v.equalsIgnoreCase("eng") || v == "jpn" ||
      v == "ger" || v == "fre"))
  }

  test("movies pair: format rules are exact on rotation and separator errors") {
    // movies_1 — the reference's largest golden pair (3,999 x 17;
    // BASELINE.md row 1). Error classes: thousands-separator commas in
    // RatingCount, slug-for-id rotations in Id/Year, "5/10,5/10"
    // rotations in RatingValue. Multi-line quoted descriptions need
    // the multiLine reader path.
    val mdir = "/root/reference/datasets/Quintet_Split/movies_1"
    val clean0 = Ingest.readCsvStrict(spark, s"$mdir/clean.csv", multiLine = true)
    val dirty0 = Ingest.readCsvStrict(spark, s"$mdir/dirty.csv", multiLine = true)
      .toDF(clean0.columns.toIndexedSeq: _*)
    assert(dirty0.count() === 3999 && clean0.count() === 3999)
    val dirty = Ingest.withRowId(dirty0).localCheckpoint()
    val clean = Ingest.withRowId(clean0).localCheckpoint()

    val actual = Metrics.actualErrorCells(dirty, clean, "row_id")
    val rules: Seq[RuleSpec] = Seq(
      RegexRule("Id", "^tt\\d+$"),
      RegexRule("RatingCount", "^\\d+$"),
      RegexRule("Year", "^\\d{4}$"),
      RegexRule("RatingValue", "^\\d+(\\.\\d+)?$"))
    val predicted = Metrics.mergeErrors(
      ViolationScanner.scan(dirty, "movies", rules, "row_id")
        .select("row_id", "column"))
    val scores = Metrics.score(predicted, actual).collect()
      .map(r => r.getAs[String]("column") ->
        (r.getAs[Double]("precision"), r.getAs[Double]("recall"))).toMap
    // format violations ARE the planted errors for these columns
    assert(scores("Id") === ((1.0, 1.0)))
    assert(scores("RatingCount") === ((1.0, 1.0)))
    assert(scores("Year") === ((1.0, 1.0)))
    // the 7.0-vs-7 class is format-valid — invisible to validity rules
    val (pv, rv) = scores("RatingValue")
    assert(pv === 1.0 && rv > 0.15 && rv < 0.25, s"RatingValue P=$pv R=$rv")
  }

  test("DGov lake pair: diff matches clean_changes; enum rules are exact") {
    // datasets/DGov/305b_Assessed_Lake_2018 — the one reference dataset
    // family with an explicit change log (clean_changes.csv:
    // "<objectid>.<column>,<dirty>,<clean>", 693 cells). Headers differ
    // (dirty carries "(long)" type suffixes) → positional alignment.
    val gdir = "/root/reference/datasets/DGov/305b_Assessed_Lake_2018"
    val clean = Ingest.readCsvStrict(spark, s"$gdir/clean.csv", multiLine = true)
    val dirty = Ingest.readCsvStrict(spark, s"$gdir/dirty.csv", multiLine = true)
      .toDF(clean.columns.toIndexedSeq: _*)

    // 1. our cell diff must reproduce the published change log exactly
    val actual = Metrics.actualErrorCells(dirty, clean, "objectid")
    val actualSet = actual.select("row_id", "column")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // the change log itself holds multi-line quoted values — CSV-parse it
    val changeSet = spark.read
      .option("multiLine", "true").option("header", "false")
      .csv(s"$gdir/clean_changes.csv")
      .collect().map { r =>
        val Array(row, col) = r.getString(0).split("\\.", 2)
        (row.toLong, col)
      }.toSet
    assert(changeSet.size === 693)
    assert(actualSet === changeSet)

    // 2. enum rules trained on CLEAN catch every categorical typo with
    // zero false positives: the planted typos always leave the domain
    val cats = Seq("sizeunit", "watertype", "impaired", "classname",
      "aquatic_life_attainment", "recreational_attainment",
      "fish_consumption_attainment", "drinking_water_attainment",
      "aquatic_life_attainment_code", "recreational_attainment_code",
      "fish_consumptin_attainment_code", "drinking_water_attainment_code")
    // enum (domain) + not-null per column — the pair a clean-profile
    // generation would produce (all 12 are fully present in clean);
    // the *_code typos include blanked cells, which are presence errors
    val rules: Seq[RuleSpec] =
      cats.flatMap(c => RuleGenerator.enumRule(clean, c)) ++
        cats.map(c => NotNullRule(c))
    assert(rules.size === 2 * cats.size)
    val predicted = Metrics.mergeErrors(
      ViolationScanner.scan(dirty, "lake", rules, "objectid"))
    val scores = Metrics.score(predicted, actual).collect()
      .map(r => r.getAs[String]("column") ->
        (r.getAs[Double]("precision"), r.getAs[Double]("recall"))).toMap
    cats.foreach { c =>
      assert(scores(c) === ((1.0, 1.0)), s"$c: ${scores(c)}")
    }
    // free-text columns (watername/locationvalue/id) hold the other 150
    // cells — invisible to domain rules by design
    val (op, orr) = scores("__overall__")
    assert(op === 1.0)
    assert(math.abs(orr - 543.0 / 693.0) < 1e-9, s"overall recall $orr")
  }

  test("DGov 2020 lake pair: same harness, second schema generation") {
    // the 2020 cycle renames every column (assessmentunitid,
    // ct_two_zero_two_zero_* use columns) — same error process
    val gdir = "/root/reference/datasets/DGov/305b_Assessed_Lake_2020"
    val clean = Ingest.readCsvStrict(spark, s"$gdir/clean.csv", multiLine = true)
    val dirty = Ingest.readCsvStrict(spark, s"$gdir/dirty.csv", multiLine = true)
      .toDF(clean.columns.toIndexedSeq: _*)
    val actual = Metrics.actualErrorCells(dirty, clean, "objectid")
    val changeSet = spark.read
      .option("multiLine", "true").option("header", "false")
      .csv(s"$gdir/clean_changes.csv")
      .collect().map { r =>
        val Array(row, col) = r.getString(0).split("\\.", 2)
        (row.toLong, col)
      }.toSet
    assert(changeSet.size === 442)
    assert(actual.select("row_id", "column").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === changeSet)

    val cats = Seq("watertypename", "units", "useclassname", "impaired") ++
      Seq("aql", "rec", "fshcon", "dw").flatMap(u => Seq(
        s"ct_two_zero_two_zero_${u}_use_usename",
        s"ct_two_zero_two_zero_${u}_use_attainment"))
    val rules: Seq[RuleSpec] =
      cats.flatMap(c => RuleGenerator.enumRule(clean, c)) ++
        cats.map(c => NotNullRule(c))
    val predicted = Metrics.mergeErrors(
      ViolationScanner.scan(dirty, "lake2020", rules, "objectid"))
    val scores = Metrics.score(predicted, actual).collect()
      .map(r => r.getAs[String]("column") ->
        (r.getAs[Double]("precision"), r.getAs[Double]("recall"))).toMap
    cats.foreach(c => assert(scores(c) === ((1.0, 1.0)), s"$c: ${scores(c)}"))
    val (op, orr) = scores("__overall__")
    assert(op === 1.0)
    assert(math.abs(orr - 343.0 / 442.0) < 1e-9, s"overall recall $orr")
  }

  test("Quintet_Match pairs: profile matching recovers the identity mapping") {
    // The reference's matching fixtures (datasets/Quintet_Match) pair a
    // table with a copy of itself: the matcher must align every column
    // with its counterpart from PROFILES alone, despite several columns
    // sharing a type (city/state/beer_name are all strings). Hungarian
    // 1-1 assignment over candidate scores must return the identity.
    Seq("beers", "hospital").foreach { name =>
      val mdir = s"/root/reference/datasets/Quintet_Match/${name}_1"
      val mdir2 = s"/root/reference/datasets/Quintet_Match/${name}_2"
      val t1 = Ingest.readCsvStrict(spark, s"$mdir/dirty.csv")
      val t2 = Ingest.readCsvStrict(spark, s"$mdir2/dirty.csv")
      val profiles = graft.profile.Profiler.profileMany(
        Seq("t1" -> t1, "t2" -> t2)).localCheckpoint()
      val cands = graft.matching.ColumnMatcher.candidates(
        profiles.filter(col("table") === "t1"),
        profiles.filter(col("table") === "t2"))
      val mapping = graft.matching.ColumnMatcher.assign(cands).toMap
      val wrong = mapping.filter { case (s, t) => s != t }
      assert(wrong.isEmpty, s"$name mis-pairs: $wrong")
      assert(mapping.size === t1.columns.length)
    }
  }

  test("lake discovery + YAML rules run the reference lake end to end") {
    // datasets/Quintet is exactly the <dir>/<table>/dirty.csv layout
    // discoverLake expects; drive the declared-rule surface over it
    val lake = Ingest.discoverLake(spark, "/root/reference/datasets/Quintet")
    assert(lake.keySet === Set("hospital", "flights", "beers", "rayyan"))
    assert(lake.values.forall(_._2.isDefined)) // every table has a clean side
    val entries = YamlRules.loadFile("/root/reference/rules.yaml")
    val (hospital, _) = lake("hospital")
    val out = YamlRules.scanWith(hospital, "hospital", entries, Map(
        "matches_regex" -> Map("column" -> "zip", "expected_pattern" -> "^\\d{5}$"),
        "length_within" -> Map("column" -> "state",
          "min_length" -> 2, "max_length" -> 2)),
      keyCol = "index")
    val byRule = out.groupBy("rule").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the hospital pair plants x-substitution typos in zips and states
    assert(byRule.getOrElse("regex(zip)", 0L) > 10L)
    assert(byRule.getOrElse("length(state)", 0L) === 0L) // typos keep length 2
  }

  test("regex + OOV detectors score against the golden diff") {
    val (dirty, clean) = loadPair()
    val actual = Metrics.actualErrorCells(dirty, clean, "index")

    // reference-style regex rules (dictionary_rule.py profiles)
    val regexRules: Seq[RuleSpec] = Seq(
      RegexRule("ProviderNumber", "^\\d{5}$"),
      RegexRule("ZipCode", "^\\d{5}$"),
      RegexRule("PhoneNumber", "^\\d{10}$"))
    val regexViolations = ViolationScanner
      .scan(dirty, "hospital", regexRules, "index")

    // spell-check stand-in (P9): cells whose MeasureName contains a
    // corpus-rare token (the x-substitution typos are one-off strings)
    val oov = TextAnalysis.oovTokens(dirty.select(col("index"),
      col("MeasureName")), "MeasureName", "index", minDocFreq = 3)
    val flagged = dirty
      .select(col("index").cast("long").as("row_id"),
        explode(split(lower(col("MeasureName")), "[^a-z0-9]+")).as("word"))
      .join(oov, "word")
      .select(col("row_id"), lit("MeasureName").as("column"))
      .distinct()

    val predicted = Metrics.mergeErrors(
      regexViolations.select("row_id", "column")
        .unionByName(flagged))
    val scores = Metrics.score(predicted, actual).collect()
      .map(r => r.getAs[String]("column") ->
        (r.getAs[Double]("precision"), r.getAs[Double]("recall"))).toMap
    val (mp, mr) = scores("MeasureName")
    // typo cells contain corpus-rare tokens → high recall; rare-but-real
    // tokens cost some precision
    assert(mr > 0.8, s"MeasureName recall $mr")
    assert(mp > 0.5, s"MeasureName precision $mp")
    val (op, orr) = scores("__overall__")
    assert(orr > 0.1 && op > 0.3, s"overall precision=$op recall=$orr")
  }
}
