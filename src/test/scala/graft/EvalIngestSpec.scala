package graft

import graft.eval.Metrics
import graft.ingest.Ingest
import org.apache.spark.sql.functions._

class EvalIngestSpec extends SparkSpec {
  import spark.implicits._

  test("cell diff finds exactly the mutated cells") {
    val clean = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "c1", "c2")
    val dirty = Seq((1L, "a", "x"), (2L, "BAD", "y"), (3L, "c", null: String))
      .toDF("id", "c1", "c2")
    val diff = Metrics.actualErrorCells(dirty, clean, "id").collect()
      .map(r => (r.getAs[Long]("row_id"), r.getAs[String]("column"))).toSet
    assert(diff == Set((2L, "c1"), (3L, "c2")))
  }

  test("score computes correct P/R/F1") {
    val predicted = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("row_id", "column")
    val actual = Seq((1L, "a"), (4L, "a")).toDF("row_id", "column")
    val rows = Metrics.score(predicted, actual).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    val overall = rows("__overall__")
    assert(overall.getAs[Long]("tp") == 1)
    assert(overall.getAs[Long]("fp") == 2)
    assert(overall.getAs[Long]("fn") == 1)
    assert(math.abs(overall.getAs[Double]("precision") - 1.0 / 3) < 1e-9)
    assert(math.abs(overall.getAs[Double]("recall") - 0.5) < 1e-9)
  }

  test("scoreByRule attributes hits per rule, duplicates collapsed") {
    val violations = Seq(
      ("r1", 1L, "a"), ("r1", 1L, "a"), // duplicate flag: counts once
      ("r1", 2L, "a"), // r1 false positive
      ("r2", 4L, "b")) // r2 exact hit
      .toDF("rule", "row_id", "column")
    val actual = Seq((1L, "a"), (4L, "b"), (9L, "c")).toDF("row_id", "column")
    val rows = Metrics.scoreByRule(violations, actual).collect()
      .map(r => r.getAs[String]("rule") -> r).toMap
    assert(rows("r1").getAs[Long]("n_flagged") == 2)
    assert(rows("r1").getAs[Long]("tp") == 1)
    assert(rows("r1").getAs[Long]("fp") == 1)
    assert(math.abs(rows("r1").getAs[Double]("precision") - 0.5) < 1e-9)
    assert(math.abs(rows("r1").getAs[Double]("error_coverage") - 1.0 / 3) < 1e-9)
    assert(rows("r2").getAs[Long]("fp") == 0)
    assert(math.abs(rows("r2").getAs[Double]("precision") - 1.0) < 1e-9)
  }

  test("strict CSV reader keeps everything as trimmed strings") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "t.csv")
    java.nio.file.Files.writeString(f.toPath,
      "id,name,amt\n1,  alice  ,3.5\n2,,oops\n")
    val df = Ingest.readCsvStrict(spark, f.getPath)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = df.collect()
    assert(rows(0).getString(1) == "alice") // trimmed
    assert(df.columns.toSeq == Seq("id", "name", "amt"))
  }

  test("normalizing reader unescapes html and collapses whitespace") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv2").toFile
    val f = new java.io.File(dir, "t.csv")
    java.nio.file.Files.writeString(f.toPath,
      "a\nTom &amp;  Jerry\nx&lt;y\n")
    val vals = Ingest.readCsvNormalizing(spark, f.getPath)
      .collect().map(_.getString(0)).toSet
    assert(vals == Set("Tom & Jerry", "x<y"))
  }

  test("withRowId assigns stable sequential ids") {
    val df = Seq("a", "b", "c").toDF("v")
    val ids = Ingest.withRowId(df).select("row_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(0L, 1L, 2L))
  }

  test("lake discovery pairs dirty and clean") {
    val root = java.nio.file.Files.createTempDirectory("graft-lake").toFile
    val t1 = new java.io.File(root, "t1"); t1.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(t1, "dirty.csv").toPath, "a\n1\n")
    java.nio.file.Files.writeString(new java.io.File(t1, "clean.csv").toPath, "a\n1\n")
    val t2 = new java.io.File(root, "t2"); t2.mkdirs()
    java.nio.file.Files.writeString(new java.io.File(t2, "dirty.csv").toPath, "b\n2\n")
    val lake = Ingest.discoverLake(spark, root.getPath)
    assert(lake.keySet == Set("t1", "t2"))
    assert(lake("t1")._2.isDefined && lake("t2")._2.isEmpty)
  }

  test("jdbc scan enters the all-string lake dialect (embedded Derby)") {
    // Derby ships on Spark's classpath (Hive metastore dependency) —
    // an embedded in-memory DB exercises the real JDBC source path
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE people (id INT, name VARCHAR(20), score DOUBLE)")
      st.execute("INSERT INTO people VALUES (1, ' alice ', 9.5), (2, 'bob', NULL)")
      st.close()
      val df = Ingest.readJdbc(spark, url, "people")
      assert(df.schema.fields.forall(_.dataType ==
        org.apache.spark.sql.types.StringType))
      val rows = df.orderBy("ID").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(rows === Array(("1", "alice", "9.5"), ("2", "bob", null)))
      // violation scan runs directly on the JDBC frame
      val v = graft.rules.ViolationScanner.scan(
        df, "people", Seq(graft.rules.NotNullRule("SCORE")), "ID")
      assert(v.select("row_id").collect().map(_.getLong(0)).toSeq === Seq(2L))
    } finally {
      conn.close()
      try java.sql.DriverManager.getConnection("jdbc:derby:memory:graftdb;drop=true")
      catch { case _: java.sql.SQLException => () } // drop always throws 08006
    }
  }
}
