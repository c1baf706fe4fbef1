package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.core.Tables

/** The events.ts on-disk encoding has changed across testdata
  * generations (TIMESTAMP(NANOS) read as nano-longs via nanosAsLong,
  * then TIMESTAMP(MICROS) read as TIMESTAMP_NTZ). Tables.load must
  * normalize BOTH to session-zone TimestampType with identical values —
  * the round-6 testdata regen silently broke every event-time query
  * because only the nano-long path existed. Pin both here.
  */
class TablesSpec extends SparkTestBase {

  // one event instant, micro precision: 2024-03-05 06:07:08.123456 UTC
  private val micros = 1709618828123456L

  private def writeFixture(write: String => Unit): String = {
    val dir = Files.createTempDirectory("graft_events_enc").toFile
    dir.deleteOnExit()
    write(dir.getAbsolutePath)
    dir.getAbsolutePath
  }

  test("load(events): nano-long encoding rebuilds TimestampType micros") {
    val dir = writeFixture { d =>
      // LongType column named ts = the shape nanosAsLong produces for
      // TIMESTAMP(NANOS) parquet
      spark.range(1).select(
        lit(micros * 1000L).as("ts"), lit(7L).as("user_id"))
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("load(events): TIMESTAMP_NTZ encoding casts to TimestampType, value-preserving under UTC") {
    val dir = writeFixture { d =>
      spark.range(1).select(
        timestamp_micros(lit(micros)).cast("timestamp_ntz").as("ts"),
        lit(7L).as("user_id"))
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    // sanity: the fixture really round-trips as NTZ, not TimestampType
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType != LongType)
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("load(events): already-TimestampType passes through untouched") {
    val dir = writeFixture { d =>
      spark.range(1).select(
        timestamp_micros(lit(micros)).as("ts"), lit(7L).as("user_id"))
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).head.getLong(0) == micros)
  }

  test("EventStream.source normalizes ts to TimestampType for the live testdata encoding") {
    val src = graft.streaming.EventStream.source(spark, sfDir)
    assert(src.schema("ts").dataType == TimestampType)
  }
}
