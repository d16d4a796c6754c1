package graft.validate

import graft.TestSpark
import graft.schema.TableMeta
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ValidateAndSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val meta = TableMeta.fromMetadata(
    Seq("id" -> "int", "amount" -> "float", "d" -> "date",
        "ts" -> "timestamp", "note" -> "string"),
    nonNullableFields = Seq("id"))

  private def df(rows: Seq[Row]) = {
    val schema = StructType(Seq(
      StructField(" ID ", StringType),    // stray spaces + case: O10/O11
      StructField("Amount", StringType),
      StructField("d", StringType),
      StructField("ts", StringType),
      StructField("note", StringType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }

  test("clean rows land in valid with declared types, lowercased names") {
    val s = ValidateAndSplit(
      df(Seq(Row("1", "2.5", "2024-01-15", "2024-01-15 10:00:00", "ok"))), meta)
    val v = s.valid.collect()
    assert(v.length === 1 && s.invalid.count() === 0)
    assert(s.valid.schema.map(_.name) === Seq("id", "amount", "d", "ts", "note"))
    assert(s.valid.schema.map(_.dataType) ===
      Seq(LongType, DoubleType, DateType, TimestampType, StringType))
    assert(v(0).getLong(0) === 1L && v(0).getDouble(1) === 2.5)
  }

  test("null in non-nullable -> error; null in nullable -> valid NULL") {
    val s = ValidateAndSplit(df(Seq(
      Row(null, "1.0", "2024-01-15", "2024-01-15 10:00:00", "x"),
      Row("2", null, "2024-01-15", "2024-01-15 10:00:00", "y"))), meta)
    val inv = s.invalid.collect()
    assert(inv.length === 1)
    assert(inv(0).getAs[String]("error_type") === "Null value in non-nullable column: id")
    val v = s.valid.collect()
    assert(v.length === 1 && v(0).isNullAt(1))
  }

  test("int accept-grammar: trims, rejects 3.5/abc/overflow") {
    val s = ValidateAndSplit(df(Seq(
      Row(" 42 ", "1", "2024-01-15", "2024-01-15 10:00:00", "a"),
      Row("3.5", "1", "2024-01-15", "2024-01-15 10:00:00", "b"),
      Row("abc", "1", "2024-01-15", "2024-01-15 10:00:00", "c"),
      Row("99999999999999999999", "1", "2024-01-15", "2024-01-15 10:00:00", "d"),
      Row("-7", "1", "2024-01-15", "2024-01-15 10:00:00", "e"))), meta)
    assert(s.valid.select("id").collect().map(_.getLong(0)).sorted === Array(-7L, 42L))
    val errs = s.invalid.collect().map(_.getAs[String]("error_type"))
    assert(errs.length === 3 && errs.forall(_ == "Type mismatch for column: id"))
  }

  test("float accept-grammar: scientific ok, junk rejected") {
    val s = ValidateAndSplit(df(Seq(
      Row("1", "1.5e3", "2024-01-15", "2024-01-15 10:00:00", "a"),
      Row("2", "x1.0", "2024-01-15", "2024-01-15 10:00:00", "b"))), meta)
    assert(s.valid.select("amount").collect().map(_.getDouble(0)) === Array(1500.0))
    assert(s.invalid.collect()(0).getAs[String]("error_type") ===
      "Type mismatch for column: amount")
  }

  test("date pinned formats; timestamp strict single format") {
    val s = ValidateAndSplit(df(Seq(
      Row("1", "1", "2024/01/15", "2024-01-15 10:00:00", "slash-date ok"),
      Row("2", "1", "01/15/2024", "2024-01-15 10:00:00", "us-date ok"),
      Row("3", "1", "15.01.2024", "2024-01-15 10:00:00", "bad date"),
      Row("4", "1", "2024-01-15", "2024/01/15 10:00:00", "bad ts fmt"))), meta)
    assert(s.valid.count() === 2)
    val errs = s.invalid.orderBy("record").collect().map(_.getAs[String]("error_type")).sorted
    assert(errs === Array("Type mismatch for column: d", "Type mismatch for column: ts"))
  }

  test("missing column errors every row; errors join with '; '") {
    val schema = StructType(Seq(StructField("id", StringType)))
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row("1")); rows.add(Row(null))
    val s = ValidateAndSplit(spark.createDataFrame(rows, schema), meta)
    assert(s.valid.count() === 0)
    val errs = s.invalid.collect().map(_.getAs[String]("error_type")).sorted
    // row "1": 4 missing columns; row null: null-in-non-nullable + 4 missing
    assert(errs(0) === "Missing column: amount; Missing column: d; Missing column: ts; Missing column: note")
    assert(errs(1) === "Null value in non-nullable column: id; Missing column: amount; Missing column: d; Missing column: ts; Missing column: note")
  }

  test("invalid record is the JSON of the raw row") {
    val s = ValidateAndSplit(df(Seq(
      Row(null, "1.0", "2024-01-15", "2024-01-15 10:00:00", "x"))), meta)
    val rec = s.invalid.collect()(0).getAs[String]("record")
    assert(rec.contains("\"Amount\":\"1.0\"") && rec.contains("\"note\":\"x\""))
  }

  test("typed (non-string) input columns validate without string round-trip") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType),
      StructField("d", DateType), StructField("ts", TimestampType),
      StructField("note", StringType)))
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(5L, 1.25, java.sql.Date.valueOf("2024-01-15"),
      java.sql.Timestamp.valueOf("2024-01-15 10:00:00"), "typed"))
    val s = ValidateAndSplit(spark.createDataFrame(rows, schema), meta)
    assert(s.valid.count() === 1 && s.invalid.count() === 0)
  }

  test("integral double accepted for int; fractional rejected") {
    val schema = StructType(Seq(
      StructField("id", DoubleType), StructField("amount", StringType),
      StructField("d", StringType), StructField("ts", StringType),
      StructField("note", StringType)))
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(3.0, "1", "2024-01-15", "2024-01-15 10:00:00", "a"))
    rows.add(Row(3.5, "1", "2024-01-15", "2024-01-15 10:00:00", "b"))
    val s = ValidateAndSplit(spark.createDataFrame(rows, schema), meta)
    assert(s.valid.select("id").collect().map(_.getLong(0)) === Array(3L))
    assert(s.invalid.count() === 1)
  }

  test("property: any generated batch partitions exactly, with typed valid rows") {
    import org.scalacheck.{Gen, Prop, Test => SC}
    // Cells deliberately mix well-typed, mis-typed, null, and junk values
    // across every accept-grammar class.
    val cell: Gen[String] = Gen.oneOf(
      Gen.const(null: String),
      Gen.chooseNum(-1000000L, 1000000L).map(_.toString),
      Gen.chooseNum(-1e6, 1e6).map(d => f"$d%.3f"),
      Gen.const("3.5"), Gen.const("abc"), Gen.const(""),
      Gen.const("2024-01-15"), Gen.const("2024-01-15 10:00:00"),
      Gen.const("01/15/2024"), Gen.const("not-a-date"),
      Gen.alphaNumStr.map(_.take(12)))
    val row: Gen[Row] = Gen.listOfN(5, cell).map(cs => Row(cs: _*))
    val batch: Gen[Seq[Row]] = Gen.choose(0, 25).flatMap(Gen.listOfN(_, row))

    val prop = Prop.forAll(batch) { rows =>
      val s = ValidateAndSplit(df(rows), meta)
      val valid = s.valid.collect()
      val nInvalid = s.invalid.collect()
      // 1. exact partition of the input
      val partitions = valid.length + nInvalid.length == rows.length
      // 2. valid side: lowercased declared names and declared types
      // (nullability flags come from the cast expressions, not the meta)
      val schemaOk = s.valid.schema.map(f => (f.name, f.dataType)) ==
        meta.fields.map(f => (f.outName, f.dataType))
      // 3. non-nullable column never null on the valid side
      val nonNullOk = valid.forall(r => !r.isNullAt(0))
      // 4. every invalid row carries at least one recognized error class
      val errOk = nInvalid.forall { r =>
        val e = r.getAs[String]("error_type")
        e != null && e.nonEmpty && e.split("; ").forall(m =>
          m.startsWith("Missing column: ") ||
          m.startsWith("Null value in non-nullable column: ") ||
          m.startsWith("Type mismatch for column: "))
      }
      partitions && schemaOk && nonNullOk && errOk
    }
    val res = SC.check(SC.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("RowRule: typed-value rules accumulate after field errors; null result = violation") {
    val s = ValidateAndSplit(
      df(Seq(
        Row("1", "5.0", null, null, "ok"),        // passes all
        Row("2", "-3.5", null, null, "ok"),       // fails range rule
        Row("3", "bad", null, null, "ok"),        // cast error; guard skips rule
        Row(null, "-1.0", null, null, "ok"),      // null id + rule violation
        Row("5", "2.0", null, null, null)         // unguarded note rule: null -> violation
      )),
      meta,
      Seq(
        ValidateAndSplit.RowRule("nonnegative_amount",
          p => p("amount").isNull || p("amount") >= 0),
        ValidateAndSplit.RowRule("note_short", p => org.apache.spark.sql
          .functions.length(p("note")) <= 10)))
    val valid = s.valid.collect().map(_.getAs[Long]("id")).toSet
    assert(valid === Set(1L))
    val errs = s.invalid.collect().map(_.getAs[String]("error_type")).sorted
    assert(errs === Array(
      "Null value in non-nullable column: id; Rule violated: nonnegative_amount",
      "Rule violated: nonnegative_amount",
      "Rule violated: note_short", // row 5: null note, unguarded rule
      "Type mismatch for column: amount"))
  }

  test("RowRule: referencing an undeclared field fails fast") {
    val e = intercept[IllegalArgumentException] {
      ValidateAndSplit(df(Seq(Row("1", "1.0", null, null, "x"))), meta,
        Seq(ValidateAndSplit.RowRule("bad", p => p("nope") >= 0)))
    }
    assert(e.getMessage.contains("undeclared field: nope"))
  }
}
