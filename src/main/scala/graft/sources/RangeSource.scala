package graft.sources

import java.util

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 connector: a deterministic synthetic-row
  * generator (`spark.read.format("graft.sources.RangeSource")
  * .option("start", …).option("end", …).option("splits", …).load()`),
  * the connector-extension surface of the engine — the reference's
  * source story is fixed code paths (blob listing S2, `pd.read_json`
  * S1); on Spark a new source is a PLUGGABLE Table/Scan/Batch stack
  * that the whole optimizer then works against, and this file is the
  * minimal complete example of that stack with both pushdown
  * interfaces implemented:
  *
  *   - [[SupportsPushDownFilters]]: id-bound predicates narrow the
  *     generated range at PLAN time, and whole input partitions
  *     outside the bounds are never created ("split pruning" — the
  *     generator analogue of parquet row-group pruning, q31/q41's
  *     property for a source that has no files). Handled filters are
  *     consumed (not re-evaluated post scan); unhandled ones are
  *     returned to Spark.
  *   - [[SupportsPushDownRequiredColumns]]: the reader materializes
  *     ONLY requested columns — pruning `tag` skips the per-row MD5,
  *     a real compute saving, not just narrower rows.
  *
  * Rows are pure functions of the id (`bucket = id % 97`; `tag` =
  * first 12 hex chars of the MD5 of the DECIMAL string of id — the
  * c03 checksum idiom, engine-neutral so DuckDB's `md5(n::VARCHAR)`
  * reproduces it exactly), so any slice of the source is
  * reproducible anywhere — which is what makes a 100 TB synthetic
  * benchmark table free: no I/O, no storage, perfectly even splits,
  * and every executor generates its share independently.
  *
  * Scale notes: `splits` controls parallelism (contiguous id chunks;
  * empty chunks after pushdown are dropped at planning). State per
  * partition is one counter — no memory pressure at any row count.
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val start = java.lang.Long.parseLong(
      Option(properties.get("start")).getOrElse("1"))
    val end = java.lang.Long.parseLong(
      Option(properties.get("end")).getOrElse("1000"))
    val splits = Integer.parseInt(
      Option(properties.get("splits")).getOrElse("8"))
    require(splits > 0, s"splits must be positive, got $splits")
    new RangeSource.RangeTable(start, end, splits)
  }
}

object RangeSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  private[sources] def tagOf(id: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(6).map(b => f"${b & 0xff}%02x").mkString
  }

  private[sources] class RangeTable(start: Long, end: Long, splits: Int)
      extends Table with SupportsRead {
    override def name(): String = s"graft_range($start..$end)"
    override def schema(): StructType = fullSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(
        options: CaseInsensitiveStringMap): ScanBuilder =
      new RangeScanBuilder(start, end, splits)
  }

  private[sources] class RangeScanBuilder(start: Long, end: Long, splits: Int)
      extends ScanBuilder
      with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
    private var lo = start
    private var hi = end
    private var pushed = Array.empty[Filter]
    private var required: StructType = fullSchema

    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      val (handled, rest) = filters.partition {
        case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1); true
        case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
        case LessThan("id", v: Long)           => hi = math.min(hi, v - 1); true
        case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v); true
        case EqualTo("id", v: Long) =>
          lo = math.max(lo, v); hi = math.min(hi, v); true
        case _ => false
      }
      pushed = handled
      rest
    }
    override def pushedFilters(): Array[Filter] = pushed
    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema
    override def build(): Scan = new RangeScan(lo, hi, splits, required)
  }

  private[sources] class RangeScan(lo: Long, hi: Long, splits: Int,
      required: StructType) extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String = {
      val n = planInputPartitions().length
      s"graft_range bounds=[$lo..$hi] splits=$n/$splits " +
        s"columns=${required.fieldNames.mkString(",")}"
    }
    override def planInputPartitions(): Array[InputPartition] = {
      if (hi < lo) return Array.empty
      val per = math.max(1L, (hi - lo + splits) / splits)
      val parts = mutable.ArrayBuffer.empty[InputPartition]
      var a = lo
      while (a <= hi) {
        val b = math.min(hi, a + per - 1)
        parts += RangePartition(a, b)
        a = b + 1
      }
      parts.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new RangeReaderFactory(required.fieldNames)
  }

  private[sources] case class RangePartition(lo: Long, hi: Long)
      extends InputPartition

  private[sources] class RangeReaderFactory(fields: Array[String])
      extends PartitionReaderFactory {
    override def createReader(
        partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[RangePartition]
      new PartitionReader[InternalRow] {
        private var cur = p.lo - 1
        override def next(): Boolean = { cur += 1; cur <= p.hi }
        override def get(): InternalRow =
          new GenericInternalRow(fields.map[Any] {
            case "id"     => cur
            case "bucket" => cur % 97
            case "tag"    => UTF8String.fromString(tagOf(cur))
          })
        override def close(): Unit = ()
      }
    }
  }
}
