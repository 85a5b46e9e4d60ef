package graft.core

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.SparkSpec

/** Schema-drift canary for the events loader.
  *
  * The driver regenerates `/root/testdata` between rounds and the `ts`
  * column's parquet layout has already drifted once (TIMESTAMP(NANOS) →
  * TIMESTAMP_MICROS), which took out every events-derived query for a
  * round. This spec pins the contract: whatever layout the scan produces
  * (nanos-as-long, TIMESTAMP_NTZ, or session-zoned TIMESTAMP),
  * [[Tables.events]] yields the same session-zoned TimestampType column
  * with identical values.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2023-11-14T22:13:20.123456Z, plus sub-microsecond noise for the nanos
  // layout (floored away by the div-1000, matching DuckDB's read).
  private val micros = 1700000000123456L
  private val nanos  = micros * 1000L + 789L

  private def load(write: String => Unit): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("graft-tables-canary").toFile
    dir.deleteOnExit()
    write(s"${dir.getAbsolutePath}/events.parquet")
    Tables(spark, dir.getAbsolutePath).events
  }

  private def assertCanonical(df: org.apache.spark.sql.DataFrame): Unit = {
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select("ts").as[Timestamp].head()
    assert(got.toInstant == java.time.Instant.EPOCH.plusNanos(micros * 1000L))
  }

  test("events loads the legacy nanos-as-long layout") {
    assertCanonical(load { path =>
      Seq(nanos).toDF("ts").write.parquet(path)
    })
  }

  test("events loads a TIMESTAMP_NTZ (micros, unadjusted) layout") {
    assertCanonical(load { path =>
      val df = Seq(micros).toDF("us")
        .select(org.apache.spark.sql.functions.timestamp_micros(col("us"))
          .cast(TimestampNTZType).as("ts"))
      assert(df.schema("ts").dataType == TimestampNTZType)
      df.write.parquet(path)
    })
  }

  test("events passes through a session-zoned TIMESTAMP layout") {
    assertCanonical(load { path =>
      Seq(micros).toDF("us")
        .select(org.apache.spark.sql.functions.timestamp_micros(col("us")).as("ts"))
        .write.parquet(path)
    })
  }

  // Whole-testdata smoke: every driver table loads and yields a row
  // through its Tables accessor. When the driver regenerates
  // /root/testdata with a new layout, THIS test names the broken table
  // directly instead of 18 downstream suites failing on derived queries.
  test("every driver table at sf0.001 loads through its accessor") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val all = Seq(
      "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings)
    all.foreach { case (name, df) =>
      withClue(s"table $name: ") { assert(df.limit(1).count() == 1L) }
    }
    assert(t.events.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // dtypes downstream operators hard-depend on: the FloatDot/quantizer
    // family assumes array<float> embeddings; hash/join keys assume long
    // ids. A silent widening (e.g. float[] -> double[]) would not fail the
    // load but would break codegen'd expressions — pin it here.
    import org.apache.spark.sql.types._
    assert(t.embeddings.schema("embedding").dataType == ArrayType(FloatType))
    assert(t.embeddings.schema("vec_id").dataType == LongType)
    assert(t.documents.schema("doc_id").dataType == LongType)
    assert(t.documents.schema("text").dataType == StringType)
    assert(t.events.schema("user_id").dataType == LongType)
    assert(t.events.schema("value").dataType == DoubleType)
    // Unit-drift plausibility guard: the nanos-as-long branch divides by
    // 1000 assuming the long is nanoseconds. If a regeneration instead
    // emits plain int64 micros (or millis), every normalized ts lands
    // ~1000x off — around 1970 (too small) or far future (too large) —
    // while the schema checks above still pass. Pin the normalized range
    // to a sane epoch window so that drift mode fails HERE by name.
    val range = t.events.select(
      org.apache.spark.sql.functions.min("ts"),
      org.apache.spark.sql.functions.max("ts")).head()
    val (lo, hi) = (java.time.Instant.parse("1990-01-01T00:00:00Z"),
      java.time.Instant.parse("2100-01-01T00:00:00Z"))
    Seq(range.getTimestamp(0), range.getTimestamp(1)).foreach { ts =>
      withClue(s"normalized events.ts $ts outside plausible epoch range " +
        "(likely a nanos->micros/millis unit drift in the testdata): ") {
        assert(!ts.toInstant.isBefore(lo) && ts.toInstant.isBefore(hi))
      }
    }
  }
}
