package graft.sharing

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

import graft.sharing.PredicateHints.{ColumnOp, LiteralOp, NodeOp, Op}

/** Driver-side (and server-side) file skipping on per-file column stats.
  *
  * The reference parses each file's Delta `stats` string but never uses
  * it (src/client/action.rs:180-183; scan statistics are
  * `Statistics::new_unknown`, src/datasource/scan.rs:154-156). This
  * module is the SURVEY §4 improvement: evaluate the SAME predicate AST
  * that travels as `jsonPredicateHints` against each file's
  * min/max/nullCount envelope and drop files that provably contain no
  * matching row — before any partition is planned. At 100 TB the file
  * list is the driver's only per-file cost; skipping here removes whole
  * network reads, not just rows.
  *
  * Three-valued interval logic, standard data-skipping semantics:
  *  - `may`  over-approximates "some row might match" (never a false
  *    skip: missing stats / unknown ops / truncated envelopes ⇒ true);
  *  - `all`  under-approximates "every row matches" (needed only so
  *    `not` stays sound: may(¬x) = ¬all(x), all(¬x) = ¬may(x)).
  * A file is skipped iff `may` is definitively false.
  */
object StatsPruning {

  /** Parsed Delta-style per-file stats (all fields optional — absent
    * stats prune nothing). */
  final case class FileStats(
      numRecords: Option[Long],
      minValues: Map[String, String],
      maxValues: Map[String, String],
      nullCount: Map[String, Long])

  private val mapper = new ObjectMapper()

  def parse(statsJson: String): Option[FileStats] =
    try {
      val n = mapper.readTree(statsJson)
      def strMap(f: String): Map[String, String] =
        Option(n.get(f)).filterNot(_.isNull).map { m =>
          m.properties().asScala
            .filterNot(_.getValue.isNull)
            .map(e => e.getKey -> e.getValue.asText()).toMap
        }.getOrElse(Map.empty)
      def longMap(f: String): Map[String, Long] =
        Option(n.get(f)).filterNot(_.isNull).map { m =>
          m.properties().asScala
            .filterNot(_.getValue.isNull)
            .map(e => e.getKey -> e.getValue.asLong()).toMap
        }.getOrElse(Map.empty)
      Some(FileStats(
        Option(n.get("numRecords")).filterNot(_.isNull).map(_.asLong()),
        strMap("minValues"), strMap("maxValues"), longMap("nullCount")))
    } catch { case _: Exception => None }

  private val IsoDate = """\d{4}-\d{2}-\d{2}""".r

  /** Tolerant timestamp parse → epoch micros: accepts the formats the
    * hint literals and Delta stats actually use ('2021-06-01 12:00:00.0',
    * '2021-06-01T12:00:00Z', '...T12:00:00.000Z', offset forms). Mixed
    * formats ordered lexicographically would mis-compare (space vs 'T',
    * trailing 'Z' vs '.000Z') and silently skip live files — so anything
    * unparsable compares as unknown, never pruning. */
  private def parseTsMicros(s: String): Option[Long] =
    try {
      val t = s.trim.replace(' ', 'T')
      val inst =
        if (t.endsWith("Z") || t.lastIndexOf('+') > 10 ||
            t.lastIndexOf('-') > 10)
          java.time.OffsetDateTime.parse(t).toInstant
        else
          java.time.LocalDateTime.parse(t).toInstant(java.time.ZoneOffset.UTC)
      Some(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
    } catch { case _: Exception => None }

  /** Codepoint-wise compare — matches the UTF-8 binary order engines use
    * for string min/max (Java's compareTo is UTF-16 code-unit order,
    * which mis-orders supplementary characters). */
  private def cmpCodepoints(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Typed ordering per hint valueType; None = don't prune. */
  private def cmp(a: String, b: String, valueType: String): Option[Int] =
    valueType match {
      case "int" | "long" | "float" | "double" =>
        try Some(BigDecimal(a).compare(BigDecimal(b)))
        catch { case _: NumberFormatException => None }
      case "date" =>
        // uniform ISO yyyy-MM-dd on both sides ⇒ lexicographic IS
        // chronological; any other shape compares as unknown
        if (IsoDate.matches(a) && IsoDate.matches(b)) Some(a.compareTo(b))
        else None
      case "timestamp" =>
        for (x <- parseTsMicros(a); y <- parseTsMicros(b))
          yield java.lang.Long.compare(x, y)
      case "string" | "bool" => Some(cmpCodepoints(a, b))
      case _ => None
    }

  /** (may-match, all-match) for `op` over a file's stats. */
  private def eval(op: Op, st: FileStats): (Boolean, Boolean) = {
    val unknown = (true, false)
    def bounds(c: ColumnOp): (Option[String], Option[String]) =
      (st.minValues.get(c.name), st.maxValues.get(c.name))
    def binary(children: Seq[Op])(
        may: (Option[Int], Option[Int]) => Option[Boolean],
        all: (Option[Int], Option[Int]) => Option[Boolean]): (Boolean, Boolean) =
      children match {
        case Seq(c: ColumnOp, l: LiteralOp) =>
          val (lo, hi) = bounds(c)
          // cmpLo = sign(min - v), cmpHi = sign(max - v)
          val cmpLo = lo.flatMap(cmp(_, l.value, l.valueType))
          val cmpHi = hi.flatMap(cmp(_, l.value, l.valueType))
          (may(cmpLo, cmpHi).getOrElse(true), all(cmpLo, cmpHi).getOrElse(false))
        case _ => unknown
      }
    op match {
      case NodeOp("equal", cs) => binary(cs)(
        may = (lo, hi) => for (a <- lo; b <- hi) yield a <= 0 && b >= 0,
        all = (lo, hi) => for (a <- lo; b <- hi) yield a == 0 && b == 0)
      case NodeOp("lessThan", cs) => binary(cs)(
        may = (lo, _) => lo.map(_ < 0),
        all = (_, hi) => hi.map(_ < 0))
      case NodeOp("lessThanOrEqual", cs) => binary(cs)(
        may = (lo, _) => lo.map(_ <= 0),
        all = (_, hi) => hi.map(_ <= 0))
      case NodeOp("greaterThan", cs) => binary(cs)(
        may = (_, hi) => hi.map(_ > 0),
        all = (lo, _) => lo.map(_ > 0))
      case NodeOp("greaterThanOrEqual", cs) => binary(cs)(
        may = (_, hi) => hi.map(_ >= 0),
        all = (lo, _) => lo.map(_ >= 0))
      case NodeOp("isNull", Seq(c: ColumnOp)) =>
        val nulls = st.nullCount.get(c.name)
        (nulls.map(_ > 0).getOrElse(true),
          (for (n <- nulls; t <- st.numRecords) yield n == t).getOrElse(false))
      case NodeOp("not", Seq(x)) =>
        val (m, a) = eval(x, st); (!a, !m)
      case NodeOp("and", cs) =>
        val r = cs.map(eval(_, st)); (r.forall(_._1), r.forall(_._2))
      case NodeOp("or", cs) =>
        val r = cs.map(eval(_, st)); (r.exists(_._1), r.exists(_._2))
      case _ => unknown
    }
  }

  /** True iff some row of a file with these stats might satisfy `op`. */
  def mayMatch(op: Op, statsJson: Option[String]): Boolean =
    statsJson.flatMap(parse) match {
      case Some(st) => eval(op, st)._1
      case None => true // no stats ⇒ never skip
    }

  /** Parse a `jsonPredicateHints` string back into an Op — the server
    * side of the loop, so hints actually prune the served file list. */
  def parseHintJson(json: String): Option[Op] =
    try fromNode(mapper.readTree(json))
    catch { case _: Exception => None }

  private def fromNode(n: JsonNode): Option[Op] =
    Option(n.get("op")).map(_.asText()).flatMap {
      case "column" =>
        for (nm <- Option(n.get("name")); vt <- Option(n.get("valueType")))
          yield ColumnOp(nm.asText(), vt.asText())
      case "literal" =>
        for (v <- Option(n.get("value")); vt <- Option(n.get("valueType")))
          yield LiteralOp(v.asText(), vt.asText())
      case kind =>
        val children = Option(n.get("children")).map(_.elements().asScala.toSeq)
          .getOrElse(Seq.empty).map(fromNode)
        // Degenerate composites like {"op":"or"} would evaluate may=false and
        // prune every file; fail open (ignore the hint) instead — hints are
        // best-effort, never row-dropping.
        if (children.isEmpty || children.exists(_.isEmpty)) None
        else Some(NodeOp(kind, children.flatten))
    }

  /** Keep only files whose stats admit a match for every conjunct. */
  def prune(files: Seq[FileAction], ops: Seq[Op]): Seq[FileAction] =
    if (ops.isEmpty) files
    else files.filter(f => ops.forall(op => mayMatch(op, f.stats)))
}
