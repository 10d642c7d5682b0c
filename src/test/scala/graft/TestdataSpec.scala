package graft

import org.apache.spark.sql.types._

/** Guard against silent testdata drift.
  *
  * Round 7 lost ten queries without a single red test because the driver
  * regenerated events.parquet with TIMESTAMP(MICROS) where the code assumed
  * TIMESTAMP(NANOS)-as-long: every query over events failed at ANALYSIS time
  * inside the verify harness, not in any spec. This spec pins the physical
  * schema the engine is written against, per table, so the next regeneration
  * that changes a type turns into one readable failure naming the table and
  * column — instead of a tenth of the correctness board silently going dark.
  *
  * events.ts is intentionally NOT pinned to a single type: the engine
  * normalizes it adaptively (QueryDef.normalizedTs) and this spec asserts the
  * observed type is within that supported set.
  */
class TestdataSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001" // smallest SF — schema is SF-independent

  // Expected Spark-side types as read with the engine's session configs
  // (nanosAsLong=true, session TZ UTC). NTZ-micros parquet surfaces as
  // TimestampNTZType in Spark 4.
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  // Types QueryDef.normalizedTs can adapt to; anything else is real drift.
  private val supportedTsTypes: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)

  private def actualFields(table: String): Map[String, DataType] =
    spark.read.parquet(s"$sf/$table.parquet").schema
      .map(f => f.name -> f.dataType).toMap

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"$table.parquet schema matches what the engine was written against") {
      val actual = actualFields(table)
      val problems = cols.flatMap { case (name, dt) =>
        actual.get(name) match {
          case None => Some(s"$table.$name: MISSING (testdata regenerated without it?)")
          case Some(a) if a != dt =>
            Some(s"$table.$name: drifted to $a, engine expects $dt")
          case _ => None
        }
      }
      assert(problems.isEmpty,
        s"\nTESTDATA DRIFT in $table.parquet — update the engine (and this spec):\n  " +
          problems.mkString("\n  "))
    }
  }

  test("events.parquet schema is within the adaptive-normalization envelope") {
    val actual = actualFields("events")
    val fixed = Seq("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    val problems = fixed.flatMap { case (name, dt) =>
      actual.get(name) match {
        case None => Some(s"events.$name: MISSING")
        case Some(a) if a != dt => Some(s"events.$name: drifted to $a, engine expects $dt")
        case _ => None
      }
    } ++ (actual.get("ts") match {
      case None => Seq("events.ts: MISSING")
      case Some(t) if !supportedTsTypes.contains(t) =>
        Seq(s"events.ts: $t is outside QueryDef.normalizedTs's supported set " +
          s"(${supportedTsTypes.mkString(", ")}) — extend the normalization")
      case _ => Nil
    })
    assert(problems.isEmpty,
      "\nTESTDATA DRIFT in events.parquet:\n  " + problems.mkString("\n  "))
  }

  // The suite's no-op limit(k) bound assertions (kmeans/PQ seed sets,
  // x110/x113/x116 query caps, winner frames) are no-ops ONLY while the
  // id columns stay unique: a fixture with duplicate vec_ids would make
  // `filter(id < k).limit(k)` silently and nondeterministically TRUNCATE
  // the seed set instead of surfacing the anomaly. Pin the invariant here
  // — at both spec SFs, since seeds are drawn at both — so a regenerated
  // fixture that breaks it turns into one readable failure, not a
  // flaky-seed mystery.
  for (sfd <- Seq("sf0.001", "sf0.01");
       (table, idCol) <- Seq("documents" -> "doc_id", "embeddings" -> "vec_id",
         "events" -> "event_id", "customer" -> "c_custkey",
         "orders" -> "o_orderkey", "supplier" -> "s_suppkey",
         "part" -> "p_partkey")) {
    test(s"$sfd/$table.$idCol is unique (limit(k) seed/cap no-op invariant)") {
      import org.apache.spark.sql.functions.{col, count, lit}
      val dup = spark.read.parquet(s"/root/testdata/$sfd/$table.parquet")
        .groupBy(col(idCol)).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).limit(5).collect()
      assert(dup.isEmpty,
        s"$sfd/$table.$idCol has duplicates (first 5: ${dup.mkString(", ")}) — " +
          "every filter(id<k).limit(k) seed set in the suite is now a silent truncation")
    }
  }
}
