package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.io.PagedIngest.Candle

/** SURVEY §2.9a: the S4 paged-ingest shape (since-cursor paging, retry
  * with quadratic backoff — reference
  * `src/data_processing/data_fetching.py:74-123`) as a first-class
  * Structured Streaming SOURCE (DataSource V2 `MicroBatchStream`), so a
  * live-API feed drives the same streaming operators st1–st6 run.
  *
  * Rate limiting is the micro-batch contract itself: each `latestOffset`
  * advance fetches at most `pagesPerBatch` pages per symbol — a
  * burst-free, deterministic admission budget per trigger.
  *
  * Delivery model: the driver advances per-symbol cursors and buffers
  * fetched rows until `commit`. The paging sequence is DETERMINISTIC
  * given the provider — symbols are iterated in declared order and each
  * pass admits at most `pagesPerBatch` pages per symbol — so a restart
  * from a checkpoint re-derives any requested offset range by replaying
  * passes from `startTs` ([[PagedMicroBatchStream.replayTo]]) and
  * re-slicing. This makes recovery exactly-once when the provider is
  * replay-stable (same pages for same (symbol, since, limit) — true of
  * any since-cursor API over immutable history); if the provider cannot
  * reproduce the range, `planInputPartitions` fails loudly rather than
  * silently returning an empty batch.
  * The page function itself is pluggable through [[PagedStreamApi]] —
  * tests and the st7 query inject deterministic in-memory "APIs"
  * (including injected transient failures exercising the retry loop);
  * production plugs an HTTP client with the same signature.
  */
object PagedStreamApi {
  /** (symbol, sinceTs, limit) → page ordered by ts; empty = exhausted. */
  type FetchPage = (String, Long, Int) => Seq[Candle]

  private val providers = new ConcurrentHashMap[String, FetchPage]()

  def register(key: String, fn: FetchPage): Unit = providers.put(key, fn)

  def get(key: String): FetchPage = {
    val fn = providers.get(key)
    require(fn != null, s"no PagedStreamApi provider registered under '$key'")
    fn
  }

  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType), StructField("ts", LongType),
    StructField("open", DoubleType), StructField("high", DoubleType),
    StructField("low", DoubleType), StructField("close", DoubleType),
    StructField("volume", DoubleType)))
}

/** `spark.readStream.format("graft-paged")` entry point (registered via
  * META-INF/services; the fully-qualified class name works too). */
class PagedStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-paged"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedStreamApi.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new PagedTable
}

class PagedTable extends Table with SupportsRead {
  override def name(): String = "graft_paged"
  override def schema(): StructType = PagedStreamApi.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = PagedStreamApi.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new PagedMicroBatchStream(options)
      }
    }
}

/** Offset = total rows admitted so far (monotone; per-symbol cursors are
  * derived driver state, deterministic given the provider). */
case class PagedOffset(served: Long) extends Offset {
  override def json: String = served.toString
}

class PagedMicroBatchStream(options: CaseInsensitiveStringMap)
  extends MicroBatchStream {

  private val fetchPage = PagedStreamApi.get(options.get("provider"))
  private val symbols = options.get("symbols").split(",").map(_.trim).toSeq
  private val startTs = Option(options.get("startTs")).map(_.toLong).getOrElse(0L)
  private val endTs = Option(options.get("endTs")).map(_.toLong).getOrElse(Long.MaxValue)
  private val pageLimit = Option(options.get("pageLimit")).map(_.toInt).getOrElse(500)
  private val pagesPerBatch = Option(options.get("pagesPerBatch")).map(_.toInt).getOrElse(1)
  private val retries = Option(options.get("retries")).map(_.toInt).getOrElse(3)
  private val baseBackoffMs = Option(options.get("baseBackoffMs")).map(_.toLong).getOrElse(0L)

  // driver-side paging state (socket-source delivery model)
  private val cursors = scala.collection.mutable.Map[String, Long](
    symbols.map(_ -> startTs): _*)
  private val exhausted = scala.collection.mutable.Set.empty[String]
  private val buffer = scala.collection.mutable.ArrayBuffer.empty[Candle]
  private var bufferBase = 0L // offset of buffer.head
  private var admitted = 0L

  /** One page with the PagedIngest retry/backoff contract. */
  private def fetchWithRetry(sym: String, since: Long): Seq[Candle] = {
    var attempt = 0
    while (true) {
      try return fetchPage(sym, since, pageLimit)
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt >= retries) throw e
          if (baseBackoffMs > 0) Thread.sleep(baseBackoffMs * attempt * attempt)
      }
    }
    Nil // unreachable
  }

  override def initialOffset(): Offset = PagedOffset(0L)

  /** One paging pass: at most `pagesPerBatch` pages per symbol, symbols
    * in declared order. Both live ingest (`latestOffset`) and restart
    * replay (`replayTo`) run this same loop, which is what makes the
    * admitted row sequence a pure function of the provider. */
  private def pagingPass(): Unit = {
    symbols.foreach { sym =>
      var pages = 0
      while (pages < pagesPerBatch && !exhausted.contains(sym)) {
        val page = fetchWithRetry(sym, cursors(sym))
        val kept = page.filter(c => c.ts >= cursors(sym) && c.ts < endTs)
        buffer ++= kept
        admitted += kept.length
        if (page.isEmpty || kept.isEmpty || page.last.ts >= endTs) exhausted += sym
        else cursors(sym) = page.last.ts + 1
        pages += 1
      }
    }
  }

  override def latestOffset(): Offset = synchronized {
    pagingPass()
    PagedOffset(admitted)
  }

  /** Restart recovery: a fresh instance has an empty buffer but the
    * engine re-executes the last uncommitted batch by offset range.
    * Re-run paging passes from the initial cursors until the requested
    * end offset is buffered (or the provider is exhausted — then the
    * caller fails loudly). Rows below `floor` are discarded as soon as
    * each pass produces them, so a replay over a long committed history
    * holds at most one paging pass plus the live range in driver memory
    * rather than the whole history. */
  private def replayTo(target: Long, floor: Long): Unit = {
    while (admitted < target && !symbols.forall(exhausted.contains)) {
      pagingPass()
      trimBelow(floor)
      peakReplayBuffered = math.max(peakReplayBuffered, buffer.length)
    }
  }

  // test visibility: pins the bounded-memory contract of replay
  // (peak is sampled after each pass's trim, so a commit fast-forward
  // over a long history must stay within one paging pass)
  private[graft] def bufferedRowCount: Int = buffer.length
  private[graft] var peakReplayBuffered: Int = 0

  /** Drop buffered rows at offsets below `floor` (capped at `admitted`). */
  private def trimBelow(floor: Long): Unit = {
    val drop = math.toIntExact(math.max(0L, math.min(floor, admitted) - bufferBase))
    if (drop > 0) { buffer.remove(0, drop); bufferBase += drop }
  }

  /** Back to the initial cursors: the admitted sequence is a pure
    * function of the provider, so any already-dropped range can be
    * regenerated by paging again from `startTs`. */
  private def resetPaging(): Unit = {
    symbols.foreach(sym => cursors(sym) = startTs)
    exhausted.clear(); buffer.clear(); bufferBase = 0L; admitted = 0L
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = synchronized {
    val s = start.asInstanceOf[PagedOffset].served
    val e = end.asInstanceOf[PagedOffset].served
    // restart orderings can acknowledge offsets and then re-request an
    // earlier range in one merged batch — regenerate from scratch
    if (s < bufferBase) { resetPaging(); replayTo(e, floor = s) }
    else if (e > bufferBase + buffer.length) replayTo(e, floor = bufferBase)
    if (e > bufferBase + buffer.length)
      throw new IllegalStateException(
        s"paged source: offset range [$s, $e) is not replayable " +
        s"(buffered [$bufferBase, ${bufferBase + buffer.length}), provider " +
        "exhausted) — the registered provider no longer reproduces the " +
        "checkpointed range")
    val rows = buffer.slice(
      math.toIntExact(s - bufferBase), math.toIntExact(e - bufferBase))
    // one partition per symbol: downstream keyed aggregations read the
    // batch in parallel with per-symbol order preserved
    rows.groupBy(_.symbol).values.map(g => PagedInputPartition(g.toArray))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val rows = partition.asInstanceOf[PagedInputPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = {
            val c = rows(i)
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(c.symbol), c.ts,
              c.open, c.high, c.low, c.close, c.volume))
          }
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[PagedOffset].served
    // On restart the engine acknowledges checkpoint-committed ranges on
    // a FRESH instance (before any latestOffset call): fast-forward the
    // paging state to the committed point first, so bufferBase never
    // jumps past rows the replay hasn't produced yet — a blind jump
    // would misattribute later replayed rows to wrong offsets. The floor
    // is the committed point itself: every replayed row is already below
    // it, so the fast-forward discards pages as it goes instead of
    // buffering the whole committed history.
    if (e > admitted) replayTo(e, floor = e)
    trimBelow(e)
  }

  override def deserializeOffset(json: String): Offset = PagedOffset(json.toLong)
  override def stop(): Unit = ()
}

case class PagedInputPartition(rows: Array[Candle]) extends InputPartition
