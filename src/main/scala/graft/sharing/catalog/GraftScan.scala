package graft.sharing.catalog

import java.util.OptionalLong

import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Literal => V2Literal}
import org.apache.spark.sql.connector.read.{Batch, Scan, Statistics, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.types._

/** Runtime-filterable wrapper over the delegated parquet scan.
  *
  * Spark's v2 `FileScan` does NOT implement runtime filtering, so a bare
  * delegate would never benefit from dynamic partition pruning — the
  * optimizer's `PartitionPruning` rule only plants a DPP subquery when
  * the scan is `SupportsRuntimeV2Filtering`. This wrapper advertises the
  * shared table's partition columns as filterable; when the join's build
  * side materializes, Spark hands the runtime predicates here and the
  * scan REBUILDS over only the matching shared files — at 100 TB the
  * difference between transferring one partition and the whole table
  * when the pruning key is only known mid-query (fact ⋈ filtered dim).
  *
  * Pruning is conservative: a file is dropped only when EVERY predicate
  * is fully understood (IN / = / IS_NOT_NULL over one partition column
  * whose type has an unambiguous string form) and positively excludes
  * the file's partition value. Anything else keeps the file — runtime
  * filters are an optimization; the join still filters rows, so keeping
  * too much is always correct while dropping too much never is.
  */
final class GraftScan(
    initial: Scan,
    files: Seq[(String, Map[String, String])],
    partitionTypes: Seq[(String, DataType)],
    rebuild: Seq[String] => Scan)
  extends Scan with SupportsRuntimeV2Filtering with SupportsReportStatistics {

  @volatile private var current: Scan = initial

  override def readSchema(): StructType = current.readSchema()
  override def description(): String = current.description()
  override def toBatch: Batch = current.toBatch
  override def estimateStatistics(): Statistics = current match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.empty()
      override def numRows(): OptionalLong = OptionalLong.empty()
    }
  }

  override def filterAttributes(): Array[NamedReference] =
    partitionTypes.map { case (c, _) => Expressions.column(c) }.toArray

  override def filter(predicates: Array[Predicate]): Unit = {
    val kept = files.filter { case (_, pv) =>
      predicates.forall(p => matches(pv, p))
    }
    GraftScan.lastRuntimeKeptFiles = Some(kept.size)
    if (kept.size < files.size) current = rebuild(kept.map(_._1))
  }

  // ---- predicate evaluation over raw partition-value strings -----------

  /** Partition-column name + type for a single-field reference, if it IS
    * a partition column of a string-unambiguous type. */
  private def partCol(e: V2Expression): Option[(String, DataType)] = e match {
    case r: NamedReference if r.fieldNames().length == 1 =>
      partitionTypes.find(_._1.equalsIgnoreCase(r.fieldNames()(0)))
    case _ => None
  }

  /** Canonical string for a literal of type `dt`; None ⇒ type not safe
    * to compare textually (dates/timestamps/decimals: keep the file). */
  private def litForm(e: V2Expression, dt: DataType): Option[String] =
    e match {
      case l: V2Literal[_] => Option(l.value()).flatMap(v => canon(v.toString, dt))
      case _ => None
    }

  /** Canonical string for a raw partition value of type `dt`. Delta
    * partitionValues use "" for NULL — surfaced as None by the caller. */
  private def canon(raw: String, dt: DataType): Option[String] = dt match {
    case StringType => Some(raw)
    case ByteType | ShortType | IntegerType | LongType =>
      raw.trim.toLongOption.map(_.toString)
    case BooleanType => Some(raw.trim.toLowerCase)
    case _ => None
  }

  /** Partition value of column `c` for pruning decisions:
    *  - `Left(())`        — cannot judge (column absent from the file's
    *    partitionValues, or the raw string failed canonicalization):
    *    the caller must KEEP the file — an unparseable value is not a
    *    NULL, and dropping on it would violate the conservative
    *    contract;
    *  - `Right(None)`     — genuine Delta NULL (empty string, for types
    *    where "" cannot be a real value);
    *  - `Right(Some(v))`  — canonicalized value.
    *
    * For STRING partition columns an empty string is AMBIGUOUS: the
    * protocol distinguishes JSON null from "" in partitionValues, but
    * this client's map representation (like the hive-path encoding)
    * collapses both to "". Pruning must not positively drop a file whose
    * value might be a genuine empty string, so StringType "" maps to
    * Left (keep) rather than NULL. */
  private def value(pv: Map[String, String], c: String, dt: DataType)
      : Either[Unit, Option[String]] =
    pv.collectFirst { case (k, v) if k.equalsIgnoreCase(c) => v } match {
      case None => Left(())
      case Some("") if dt == StringType => Left(())
      case Some("") => Right(None)
      case Some(raw) => canon(raw, dt) match {
        case None => Left(())
        case some => Right(some)
      }
    }

  /** True unless the predicate POSITIVELY excludes this file. */
  private def matches(pv: Map[String, String], p: Predicate): Boolean = {
    val ch = p.children()
    p.name() match {
      case "IN" if ch.length >= 2 =>
        partCol(ch.head) match {
          case Some((c, dt)) =>
            val lits = ch.tail.toSeq.map(litForm(_, dt))
            if (lits.forall(_.isDefined)) value(pv, c, dt) match {
              case Left(()) => true // not understood — keep
              case Right(None) => false // NULL: IN never holds — prune
              case Right(Some(v)) => lits.flatten.contains(v)
            } else true
          case None => true
        }
      case "=" if ch.length == 2 =>
        val sides = Seq((ch(0), ch(1)), (ch(1), ch(0)))
        sides.collectFirst {
          case (r, l) if partCol(r).isDefined => (partCol(r).get, l)
        } match {
          case Some(((c, dt), l)) => litForm(l, dt) match {
            case Some(lit) => value(pv, c, dt) match {
              case Left(()) => true
              case Right(None) => false // NULL = x never holds
              case Right(Some(v)) => v == lit
            }
            case None => true
          }
          case None => true
        }
      case "IS_NOT_NULL" if ch.length == 1 =>
        partCol(ch.head) match {
          // only a GENUINE Delta NULL ("") prunes; an absent or
          // unparseable value keeps the file
          case Some((c, dt)) => value(pv, c, dt) != Right(None)
          case None => true
        }
      case _ => true
    }
  }
}

object GraftScan {
  /** Driver-side observability for specs: how many files survived the
    * most recent runtime filter() call. */
  @volatile var lastRuntimeKeptFiles: Option[Int] = None
}
