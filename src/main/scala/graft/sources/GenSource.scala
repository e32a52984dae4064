package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 deterministic generator table — the engine's custom
  * connector surface (preference order (c): a whole source, not an
  * expression). `spark.read.format("graftgen").option("rows", N)` yields
  * N rows of a fixed arithmetic schema, split across `parts` input
  * partitions so every executor generates its own slice (nothing is ever
  * materialized on the driver).
  *
  * The scan implements BOTH V2 pushdown hooks:
  *  - SupportsPushDownRequiredColumns: the reader materializes only the
  *    pruned fields — a projection of 2 of 4 columns generates 2 values.
  *  - SupportsPushDownFilters: range predicates on `id` narrow the
  *    generated [lo, hi) BEFORE partition planning — the DSv2 analog of
  *    partition pruning; a `WHERE id < rows/1000` scan plans ~parts/1000
  *    of the work, which is exactly how a 100-TB source must behave
  *    (prune at planning, not per row). Non-id predicates are left as
  *    residuals for Spark's post-scan Filter.
  *
  * Row formula (everything DuckDB-expressible, so queries over this
  * source stay oracle-checkable):
  *   id     = row index in [0, rows)
  *   bucket = id % 97
  *   val    = ((id * 37) % 1000) / 10.0   — one decimal digit, exact grid
  *   tag    = 'g' || (id % 5)
  */
class GenTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GenTable.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "8").toInt)
}

object GenTable {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

class GenTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graftgen(rows=$rows)"
  override def schema(): StructType = GenTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, parts)
}

class GenScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var accepted = Array.empty[Filter]
  private var required = GenTable.schema

  /** Accept only id-range shapes we can fold into [lo, hi); everything
    * else stays a residual Spark evaluates post-scan. Accepted filters are
    * FULLY handled here, so Spark drops them from the post-scan Filter.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) | IsNotNull("id") => true
      case _ => false
    }
    // saturating successor: v+1 on Long.MaxValue would wrap negative and
    // silently invert an accepted (= residual-free) bound
    def inc(v: Long): Long = if (v == Long.MaxValue) Long.MaxValue else v + 1
    ours.foreach {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, inc(v))
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, inc(v))
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, inc(v))
      case IsNotNull("id")                   => () // id is never null
    }
    accepted = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new GenScan(lo, hi, parts, required)
}

class GenScan(lo: Long, hi: Long, parts: Int, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftgen range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  /** Contiguous slices of the (already filter-narrowed) range — pruning
    * happened at planning time, so an id-range query schedules only the
    * tasks that can produce rows.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val span = hi - lo
    val n = math.min(parts.toLong, span).toInt
    // balanced split without (span * i) products, which overflow for
    // spans near 2^63: the first span%n slices get one extra row
    def bound(i: Int): Long = lo + (span / n) * i + math.min(i.toLong, span % n)
    Array.tabulate(n)(i => GenPartition(bound(i), bound(i + 1)))
  }
  override def createReaderFactory(): PartitionReaderFactory = GenReaderFactory(required)
}

case class GenPartition(start: Long, end: Long) extends InputPartition

case class GenReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GenPartition]
    // resolve the pruned projection once per partition, not per row
    val gens: Array[Long => Any] = required.fieldNames.map {
      case "id"     => (i: Long) => i
      case "bucket" => (i: Long) => i % 97
      case "val"    => (i: Long) => ((i * 37) % 1000) / 10.0
      case "tag"    => (i: Long) => UTF8String.fromString("g" + (i % 5))
      case other    => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var cur = gp.start - 1
      override def next(): Boolean = { cur += 1; cur < gp.end }
      override def get(): InternalRow = {
        // one array per row — no intermediate Seq/boxed collection churn
        // in the innermost loop of the scan
        val values = new Array[Any](gens.length)
        var j = 0
        while (j < gens.length) { values(j) = gens(j)(cur); j += 1 }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}
