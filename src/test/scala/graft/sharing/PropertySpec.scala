package graft.sharing

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the two serialization boundaries (SURVEY §5 test
  * plan): schemaString ⇄ StructType round-trips for arbitrary supported
  * schemas, and Filter → jsonPredicateHints always emits valid JSON with
  * the reference grammar's node shapes. */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampling driver (no scalatest-scalacheck bridge in the
    * offline dependency set — raw ScalaCheck generators, fixed seeds). */
  private def forSamples[T](gen: Gen[T], n: Int = 100)(f: T => Unit): Unit =
    (1 to n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong), 100))
    }

  private val primitives: Gen[DataType] = Gen.oneOf(
    StringType, LongType, IntegerType, ShortType, ByteType, FloatType,
    DoubleType, BooleanType, BinaryType, DateType, TimestampType,
    DecimalType(38, 10), DecimalType(10, 2))

  private def dataTypeGen(depth: Int): Gen[DataType] =
    if (depth <= 0) primitives
    else Gen.frequency(
      6 -> primitives,
      1 -> Gen.lzy(dataTypeGen(depth - 1).map(ArrayType(_, true))),
      1 -> Gen.lzy(dataTypeGen(depth - 1).map(MapType(StringType, _, true))),
      1 -> Gen.lzy(structGen(depth - 1)))

  private def fieldName: Gen[String] =
    for {
      h <- Gen.alphaChar
      t <- Gen.listOfN(5, Gen.alphaNumChar)
    } yield (h :: t).mkString

  private def structGen(depth: Int): Gen[StructType] =
    for {
      n <- Gen.choose(1, 5)
      names <- Gen.listOfN(n, fieldName).map(_.distinct).suchThat(_.nonEmpty)
      types <- Gen.listOfN(names.size, dataTypeGen(depth))
      nulls <- Gen.listOfN(names.size, Arbitrary.arbitrary[Boolean])
    } yield StructType(names.lazyZip(types).lazyZip(nulls).map {
      (nm, dt, nl) => StructField(nm, dt, nl)
    })

  test("schemaString round-trips for arbitrary supported schemas") {
    forSamples(structGen(2)) { schema =>
      assert(DeltaSchema.fromSchemaString(DeltaSchema.toSchemaString(schema))
        == schema)
    }
  }

  private val hintSchema = StructType(Seq(
    StructField("s", StringType), StructField("i", IntegerType),
    StructField("l", LongType), StructField("d", DoubleType),
    StructField("b", BooleanType), StructField("dt", DateType)))

  private val leafFilter: Gen[Filter] = Gen.oneOf(
    Gen.alphaStr.map(v => EqualTo("s", v)),
    Arbitrary.arbitrary[Int].map(v => LessThan("i", v)),
    Arbitrary.arbitrary[Long].map(v => GreaterThan("l", v)),
    Arbitrary.arbitrary[Double].map(v => LessThanOrEqual("d", v)),
    Arbitrary.arbitrary[Boolean].map(v => GreaterThanOrEqual("b", v)),
    Gen.choose(0, 20000).map(days =>
      EqualTo("dt", java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(days.toLong)))),
    Gen.oneOf(hintSchema.fieldNames.toSeq).map(IsNull(_)),
    Gen.oneOf(hintSchema.fieldNames.toSeq).map(IsNotNull(_)))

  private def filterGen(depth: Int): Gen[Filter] =
    if (depth <= 0) leafFilter
    else Gen.frequency(
      4 -> leafFilter,
      1 -> Gen.lzy(for {
        l <- filterGen(depth - 1); r <- filterGen(depth - 1)
      } yield And(l, r)),
      1 -> Gen.lzy(for {
        l <- filterGen(depth - 1); r <- filterGen(depth - 1)
      } yield Or(l, r)),
      1 -> Gen.lzy(filterGen(depth - 1).map(Not(_))))

  test("predicate hints are always valid JSON in the reference grammar") {
    val mapper = new ObjectMapper()
    val validOps = Set("column", "literal", "isNull", "equal", "lessThan",
      "lessThanOrEqual", "greaterThan", "greaterThanOrEqual", "and", "or", "not")
    val validValueTypes = Set("bool", "int", "long", "string", "date",
      "float", "double", "timestamp")
    def walk(n: com.fasterxml.jackson.databind.JsonNode): Unit = {
      assert(validOps.contains(n.get("op").asText()))
      Option(n.get("valueType")).foreach(vt =>
        assert(validValueTypes.contains(vt.asText())))
      Option(n.get("children")).foreach(cs =>
        cs.elements().forEachRemaining(walk(_)))
    }
    forSamples(filterGen(3)) { f =>
      PredicateHints.fromFilter(f, hintSchema).foreach { op =>
        walk(mapper.readTree(op.json)) // throws on malformed JSON
      }
    }
  }

  test("stats pruning never skips a file containing a matching row") {
    // Soundness property for StatsPruning: random file contents (longs +
    // nulls) + random predicate trees; whenever mayMatch says skip, a
    // direct SQL-3VL evaluation over every row must find no match.
    import graft.sharing.PredicateHints._
    val colX = ColumnOp("x", "long")
    def litOf(v: Long) = LiteralOp(v.toString, "long")
    val leafGen: Gen[Op] = Gen.frequency(
      5 -> (for {
        v <- Gen.choose(-10L, 10L)
        mk <- Gen.oneOf[(Op, Op) => Op](equal _, lessThan _,
          lessThanOrEqual _, greaterThan _, greaterThanOrEqual _)
      } yield mk(colX, litOf(v))),
      1 -> Gen.const(isNull(colX)))
    def opGen(depth: Int): Gen[Op] =
      if (depth <= 0) leafGen
      else Gen.frequency(
        3 -> leafGen,
        1 -> Gen.lzy(opGen(depth - 1).map(not)),
        1 -> Gen.lzy(Gen.zip(opGen(depth - 1), opGen(depth - 1))
          .map { case (a, b) => and(Seq(a, b)) }),
        1 -> Gen.lzy(Gen.zip(opGen(depth - 1), opGen(depth - 1))
          .map { case (a, b) => or(Seq(a, b)) }))
    val fileGen: Gen[List[Option[Long]]] =
      Gen.listOfN(6, Gen.option(Gen.choose(-10L, 10L)))

    // SQL three-valued row evaluation (None = unknown)
    def evalRow(op: Op, v: Option[Long]): Option[Boolean] = op match {
      case NodeOp("isNull", _) => Some(v.isEmpty)
      case NodeOp(kind, Seq(_: ColumnOp, l: LiteralOp)) =>
        v.map { x =>
          val c = x.compare(l.value.toLong)
          kind match {
            case "equal" => c == 0
            case "lessThan" => c < 0
            case "lessThanOrEqual" => c <= 0
            case "greaterThan" => c > 0
            case "greaterThanOrEqual" => c >= 0
          }
        }
      case NodeOp("not", Seq(x)) => evalRow(x, v).map(!_)
      case NodeOp("and", cs) =>
        val r = cs.map(evalRow(_, v))
        if (r.contains(Some(false))) Some(false)
        else if (r.forall(_.contains(true))) Some(true) else None
      case NodeOp("or", cs) =>
        val r = cs.map(evalRow(_, v))
        if (r.contains(Some(true))) Some(true)
        else if (r.forall(_.contains(false))) Some(false) else None
      case _ => None
    }

    forSamples(Gen.zip(opGen(3), fileGen), n = 500) { case (op, rows) =>
      val present = rows.flatten
      val minV = if (present.isEmpty) "" else s""""x":${present.min}"""
      val maxV = if (present.isEmpty) "" else s""""x":${present.max}"""
      val stats =
        s"""{"numRecords":${rows.size},"minValues":{$minV},""" +
          s""""maxValues":{$maxV},"nullCount":{"x":${rows.count(_.isEmpty)}}}"""
      if (!StatsPruning.mayMatch(op, Some(stats))) {
        val survivors = rows.filter(r => evalRow(op, r).contains(true))
        assert(survivors.isEmpty,
          s"pruned a file with matching rows: op=${op.json} rows=$rows")
      }
    }
  }

  test("time-travel rewind equals forward replay for random change logs") {
    // simulate a valid delta log forward (adds of absent files, removes
    // of present ones), register the FINAL state + full log, then check
    // the server's rewind answers every historical version exactly
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-tt-prop")
    val paths = (0 until 6).map { i =>
      val p = dir.resolve(s"f$i.parquet")
      Files.write(p, Array[Byte](1, 2, 3)); p
    }
    val server = new graft.sharing.server.LocalSharingServer()
    val schemaStr =
      """{"type":"struct","fields":[{"name":"x","type":"long","nullable":true,"metadata":{}}]}"""
    val cases = (1 to 25).map { seed =>
      val rnd = new scala.util.Random(seed)
      var state = Set.empty[Int]
      val log = Seq.newBuilder[(Long, String, Int)]
      val states = scala.collection.mutable.Map(0L -> state)
      val maxV = 4L
      (1L to maxV).foreach { v =>
        (0 until 6).foreach { i =>
          if (rnd.nextDouble() < 0.3) {
            if (state.contains(i)) { log += ((v, "remove", i)); state -= i }
            else { log += ((v, "add", i)); state += i }
          }
        }
        states(v) = state
      }
      val name = s"t$seed"
      server.addTable("p", "s", server.TableDef(name, schemaStr, Seq.empty,
        files = state.toSeq.sorted.map(i =>
          server.ServedFile(paths(i), Map.empty)),
        version = maxV,
        changes = log.result().map { case (v, op, i) =>
          server.ChangeEntry(v, op, server.ServedFile(paths(i), Map.empty))
        }))
      (name, states.toMap)
    }
    server.start()
    val client = new DeltaSharingClient(Profile.fromJson(server.profileJson))
    try cases.foreach { case (name, states) =>
      states.foreach { case (v, expected) =>
        val (_, _, files) =
          client.getTableData(TableRef("p", "s", name), version = Some(v))
        val got = files.map(_.url.split('/').last.split('?').head).toSet
        val want = expected.map(i => s"f$i.parquet")
        assert(got == want, s"table $name at v$v: got $got want $want")
      }
    } finally server.stop()
  }

  test("date literals always render ISO YYYY-MM-DD") {
    forSamples(Gen.choose(0, 30000)) { days =>
      val d = java.time.LocalDate.ofEpochDay(days.toLong)
      val json = PredicateHints
        .fromFilter(EqualTo("dt", java.sql.Date.valueOf(d)), hintSchema)
        .get.json
      assert(json.contains(s""""value":"$d""""))
    }
  }
}
