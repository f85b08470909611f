package graft.datastream

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import graft.operators.AggregateFunction
import graft.windowing._

/** Typed fluent API mirroring the reference's `DataStream<TElement>`
  * (FlinkDotNet.Core.Api/Streaming/DataStream.cs:10-19) — but every call
  * compiles directly to a `Dataset[T]` transformation, so the logical DAG
  * the reference builds by hand (`TransformationBase`, DataStream.cs:232-321)
  * is Catalyst's `LogicalPlan`, and "operator chaining"
  * (StreamExecutionEnvironment.cs:203-246) is whole-stage codegen.
  *
  * Works identically over batch and streaming Datasets — the reference's
  * `IUnifiedSource.IsBounded` flag (IUnifiedSource.cs:6-13) is Spark's
  * `ds.isStreaming`.
  *
  * Scale note: typed lambdas (`map`/`filter` on case classes) run inside
  * codegen'd `DeserializeToObject/SerializeFromObject` pairs — fine for
  * genuinely imperative logic, but the relational surface
  * (`graft.queries.*`) should stay `Column`-based so pushdown and pruning
  * survive. This API is for the reference's typed-program style.
  */
/** Executor-side open/close guarantees for rich-lifecycle operators:
  * close runs EXACTLY once — at iterator exhaustion for the normal path,
  * or at task completion when a downstream limit/take stops consuming
  * early (otherwise a close() releasing a real resource — connection,
  * native codec handle — would leak per partition, and repeated
  * post-exhaustion hasNext calls would double-close).
  */
private[graft] object RichLifecycle {
  def wrap[A](open: => Unit, close: => Unit)(mk: => Iterator[A]): Iterator[A] = {
    open
    var closed = false
    def closeOnce(): Unit = if (!closed) { closed = true; close }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
    val inner = mk
    new Iterator[A] {
      def hasNext: Boolean = { val h = inner.hasNext; if (!h) closeOnce(); h }
      def next(): A = inner.next()
    }
  }
}

final class DataStream[T](val ds: Dataset[T]) extends Serializable {

  /** IMapOperator (IMapOperator.cs:9-17). */
  def map[R: Encoder](f: T => R): DataStream[R] = new DataStream(ds.map(f))

  /** IFilterOperator (IFilterOperator.cs:8-16). */
  def filter(p: T => Boolean): DataStream[T] = new DataStream(ds.filter(p))

  /** IFlatMapOperator + ICollector (IFlatMapOperator.cs:12-21): the
    * collector becomes the returned iterator.
    */
  def flatMap[R: Encoder](f: T => IterableOnce[R]): DataStream[R] =
    new DataStream(ds.flatMap(f(_).iterator))

  /** Rich-function lifecycle (IOperatorLifecycle.cs:9-26): `open` once per
    * partition before the first element, `close` after the last — the
    * `mapPartitions` setup/teardown idiom.
    */
  def mapRich[R: Encoder](rich: RichMapFunction[T, R]): DataStream[R] =
    new DataStream(ds.mapPartitions { it =>
      RichLifecycle.wrap(rich.open(), rich.close())(it.map(rich.map))
    })

  /** Rich filter with lifecycle (IRichFilterOperator.cs:9). */
  def filterRich(rich: RichFilterFunction[T]): DataStream[T] =
    new DataStream(ds.mapPartitions { it =>
      RichLifecycle.wrap(rich.open(), rich.close())(it.filter(rich.filter))
    }(ds.encoder))

  /** Rich flatMap with lifecycle (IRichFlatMapOperator.cs:10). */
  def flatMapRich[R: Encoder](rich: RichFlatMapFunction[T, R]): DataStream[R] =
    new DataStream(ds.mapPartitions { it =>
      RichLifecycle.wrap(rich.open(), rich.close())(
        it.flatMap(t => rich.flatMap(t).iterator))
    })

  /** KeyBy (DataStream.cs:28-49): hash-partition by key. The shuffle happens
    * lazily at the first keyed aggregation, on Spark's HashPartitioning.
    */
  def keyBy[K: Encoder](f: T => K): KeyedDataStream[K, T] =
    new KeyedDataStream(ds.groupByKey(f), ds, f)

  def union(other: DataStream[T]): DataStream[T] = new DataStream(ds.union(other.ds))

  /** IJoinFunction (IJoinFunction.cs:18-27): typed two-input equi-join —
    * key extractors select the join key on each side, `f` combines each
    * matched pair into the output element. Compiles to `Dataset.joinWith`,
    * so the physical join strategy (broadcast / shuffled hash / sort-merge,
    * AQE-adjusted) is Catalyst's choice exactly as for the DataFrame
    * surface; only the pair-combination lambda runs typed.
    */
  def join[R, K: Encoder, O: Encoder](other: DataStream[R])(
      leftKey: T => K, rightKey: R => K)(f: (T, R) => O): DataStream[O] = {
    implicit val lEnc: Encoder[(K, T)] =
      Encoders.tuple(implicitly[Encoder[K]], ds.encoder)
    implicit val rEnc: Encoder[(K, R)] =
      Encoders.tuple(implicitly[Encoder[K]], other.ds.encoder)
    val l = ds.map(t => (leftKey(t), t)).as("gl")
    val r = other.ds.map(x => (rightKey(x), x)).as("gr")
    val joined = l.joinWith(r,
      org.apache.spark.sql.functions.col("gl._1") ===
        org.apache.spark.sql.functions.col("gr._1"), "inner")
    new DataStream(joined.map { case ((_, t), (_, x)) => f(t, x) })
  }

  /** Per-operator parallelism (TransformationBase.Parallelism): an explicit
    * round-robin repartition. Usually unnecessary — AQE sizes partitions —
    * but the reference exposes it, so we do.
    */
  def setParallelism(n: Int): DataStream[T] = new DataStream(ds.repartition(n))

  /** AddSink (DataStream.cs:198-210): terminal per-record sink. For batch;
    * streaming sinks live in graft.streaming.
    */
  def addSink(sink: T => Unit): Unit = ds.foreach(sink(_))

  def collect(): Seq[T] = ds.collect().toSeq
}

/** Rich map with lifecycle (IRichMapOperator.cs:11 + IOperatorLifecycle). */
trait RichMapFunction[T, R] extends Serializable {
  def open(): Unit = ()
  def map(value: T): R
  def close(): Unit = ()
}

trait RichFilterFunction[T] extends Serializable {
  def open(): Unit = ()
  def filter(value: T): Boolean
  def close(): Unit = ()
}

trait RichFlatMapFunction[T, R] extends Serializable {
  def open(): Unit = ()
  def flatMap(value: T): IterableOnce[R]
  def close(): Unit = ()
}

/** Keyed stream (KeyedDataStream.cs:8-17): gateway to reductions, typed
  * aggregates and windows.
  */
final class KeyedDataStream[K, T](
    val grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, T],
    private val ds: Dataset[T],
    private val keyFn: T => K) extends Serializable {

  /** IReduceOperator (IReduceOperator.cs:9-18): pairwise combine per key.
    * Distributed as partial reduces before the shuffle (ReduceAggregator
    * runs map-side), matching the reference's documented combine split.
    */
  def reduce(f: (T, T) => T)(implicit kt: Encoder[(K, T)]): DataStream[(K, T)] =
    new DataStream(grouped.reduceGroups(f))

  /** IAggregateOperator (IAggregateOperator.cs:18-50) on a keyed stream:
    * zero/add/merge/finish via a Spark `Aggregator`.
    */
  def aggregate[ACC, OUT](agg: AggregateFunction[T, ACC, OUT])(
      implicit accEnc: Encoder[ACC], outEnc: Encoder[OUT],
      koEnc: Encoder[(K, OUT)]): DataStream[(K, OUT)] = {
    val sparkAgg: Aggregator[T, ACC, OUT] = AggregateFunction.toAggregator(agg)
    new DataStream(grouped.agg(sparkAgg.toColumn))
  }

  /** Attach a window assigner (WindowedStream.cs:27-39). Requires an
    * event-time extractor because the typed element carries its own time
    * (the reference tracks it per-record via `CollectWithTimestamp`).
    */
  def window(assigner: WindowAssigner, timeMs: T => Long): WindowedStream[K, T] =
    new WindowedStream(ds, keyFn, timeMs, assigner)

  def mapGroups[R: Encoder](f: (K, Iterator[T]) => R): DataStream[R] =
    new DataStream(grouped.mapGroups(f))
}

/** Windowed keyed stream (WindowedStream.cs:41-87): Reduce / Aggregate /
  * Process over (key, window) panes.
  *
  * Window assignment runs as a typed flatMap producing one record per
  * (element, window) — the reference's `AssignWindows`
  * (TumblingEventTimeWindows.cs:56-67) — then groups on (key, windowStart).
  * Tumbling/sliding use the epoch-aligned start formula (TimeWindow.cs:76-89)
  * directly; sessions gap-merge over a spill-aware secondary sort
  * (repartition by key + external sortWithinPartitions), so memory holds
  * one open session rather than a key's history.
  * The grouped aggregate is a standard shuffle + partial/final combine, so
  * the pattern scales with the number of distinct (key, window) panes.
  */
final class WindowedStream[K, T](
    ds: Dataset[T], keyFn: T => K, timeMs: T => Long, assigner: WindowAssigner,
    evictorOpt: Option[Evictor[T]] = None, latenessOpt: Option[Time] = None)
    extends Serializable {

  /** Attach an evictor (WindowedStream.Evictor, Transformations.cs:12-23):
    * trims each pane before the window function sees it.
    */
  def evictor(e: Evictor[T]): WindowedStream[K, T] =
    new WindowedStream(ds, keyFn, timeMs, assigner, Some(e), latenessOpt)

  /** AllowedLateness (WindowedStream.cs:55-63). Batch execution sees all
    * data, so this is a declaration only; streaming pipelines add it to the
    * watermark delay (`withWatermark(ts, delay + lateness)`), which is
    * exactly the reference's late-pane-refire semantics Spark supports.
    */
  def allowedLateness(l: Time): WindowedStream[K, T] = {
    require(assigner.isEventTime, "lateness only applies to event-time windows")
    new WindowedStream(ds, keyFn, timeMs, assigner, evictorOpt, Some(l))
  }

  private def applyEvictor(pane: IndexedSeq[T], w: TimeWindow): IndexedSeq[T] =
    evictorOpt.fold(pane)(e => e.evictBefore(pane, w).toIndexedSeq)

  /** Per-element assignment through the OPEN assigner contract
    * (`WindowAssigner.assignWindows`) — custom user assigners flow through
    * with no pattern-match here. Sessions are excluded: their point
    * windows need the gap-merge in `process()`.
    */
  private def assignedWindows(ts: Long): Seq[TimeWindow] =
    assigner.assignWindows(ts)

  /** Driver-side, once — NOT per element inside the executor lambda,
    * where a rejected session assigner would surface as a full round of
    * task retries instead of an immediate build-time error.
    */
  private def requireNonMerging(): Unit =
    require(!assigner.isInstanceOf[EventTimeSessionWindows],
      "session windows merge in process(); reduce/aggregate via process")

  def reduce(f: (T, T) => T)(
      implicit tEnc: Encoder[T], kwEnc: Encoder[(K, Long, Long)],
      pairEnc: Encoder[((K, Long, Long), T)],
      outEnc: Encoder[(K, Long, T)]): DataStream[(K, Long, T)] = {
    requireNonMerging()
    val (kf, tf) = (keyFn, timeMs)
    val assigned = ds.flatMap(t =>
      assignedWindows(tf(t)).map(w => ((kf(t), w.start, w.end), t)))(pairEnc)
    new DataStream(
      assigned.groupByKey(_._1)(kwEnc)
        .mapValues(_._2)(tEnc)
        .reduceGroups(f)
        .map { case ((k, ws, _), v) => (k, ws, v) }(outEnc))
  }

  /** WindowedStream.Aggregate (WindowedStream.cs:41-87): the accumulator
    * contract over panes. Implemented via process — the accumulator runs
    * once per pane element; merge is exercised by the distributed
    * pre-aggregation path in KeyedDataStream.aggregate.
    */
  def aggregate[ACC, OUT](agg: graft.operators.AggregateFunction[T, ACC, OUT])(
      implicit outEnc: Encoder[(K, Long, OUT)], kEnc: Encoder[K],
      kwEnc: Encoder[(K, Long, Long)],
      pairEnc: Encoder[((K, Long, Long), T)]): DataStream[(K, Long, OUT)] =
    process(new ProcessWindowFunction[K, T, (K, Long, OUT)] {
      def process(key: K, w: TimeWindow, elements: Iterator[T]) = {
        val acc = elements.foldLeft(agg.createAccumulator())(agg.add)
        Seq((key, w.start, agg.getResult(acc)))
      }
    })

  /** Full-window function (IProcessWindowFunction.cs:17-41): iterate the
    * pane with key + window metadata. Sessions are merged here.
    */
  def process[R: Encoder](f: ProcessWindowFunction[K, T, R])(
      implicit kEnc: Encoder[K], kwEnc: Encoder[(K, Long, Long)],
      pairEnc: Encoder[((K, Long, Long), T)]): DataStream[R] = {
    val (kf, tf) = (keyFn, timeMs)
    assigner match {
      case EventTimeSessionWindows(gap) =>
        val g = gap.millis
        // Spill-aware secondary sort instead of a per-key in-memory sort:
        // hash-partition by key and EXTERNAL-sort each partition by
        // (key, ts) — Spark's sorter spills to disk — then stream through
        // the ordered run splitting sessions at gap boundaries. Memory
        // holds ONE open session, not a key's whole history, so a
        // pathologically hot key (10⁸ events) no longer OOMs the task;
        // the only unbounded pane would be a session that genuinely never
        // pauses for `gap`, which is the operator's semantic content.
        implicit val tripleEnc: Encoder[(K, Long, T)] =
          Encoders.tuple(kEnc, Encoders.scalaLong, ds.encoder)
        import org.apache.spark.sql.functions.col
        val sorted = ds.map(t => (kf(t), tf(t), t))
          .repartition(col("_1"))
          .sortWithinPartitions(col("_1"), col("_2"))
        new DataStream(sorted.mapPartitions { rows =>
          val run = rows.buffered
          new Iterator[R] {
            private val out = scala.collection.mutable.Queue.empty[R]
            private def refill(): Unit =
              while (out.isEmpty && run.hasNext) {
                val (k, ts0, t0) = run.next()
                val pane = scala.collection.mutable.ArrayBuffer((ts0, t0))
                var paneEnd = ts0 + g
                while (run.hasNext &&
                    run.head._1 == k && run.head._2 < paneEnd) {
                  val (_, ts, t) = run.next()
                  pane += ((ts, t)); paneEnd = ts + g
                }
                val w = TimeWindow(pane.head._1, paneEnd)
                out ++= f.process(k, w,
                  applyEvictor(pane.map(_._2).toIndexedSeq, w).iterator).iterator
              }
            def hasNext: Boolean = { refill(); out.nonEmpty }
            def next(): R = { refill(); out.dequeue() }
          }
        })
      case _ =>
        new DataStream(ds.flatMap(t =>
            assignedWindows(tf(t)).map(w => ((kf(t), w.start, w.end), t)))
          .groupByKey(_._1)
          .flatMapGroups { (kw: (K, Long, Long), it: Iterator[((K, Long, Long), T)]) =>
            val w = TimeWindow(kw._2, kw._3)
            val pane = it.map(_._2).toIndexedSeq.sortBy(tf)
            f.process(kw._1, w, applyEvictor(pane, w).iterator)
          })
    }
  }
}

object WindowedStream {
  /** Reference start formula, TimeWindow.cs:76-89. */
  def startFor(ts: Long, size: Long, offset: Long): Long =
    TimeWindow.startFor(ts, size, offset)
}

/** IProcessWindowFunction (IProcessWindowFunction.cs:17-41). */
trait ProcessWindowFunction[K, T, R] extends Serializable {
  def process(key: K, window: TimeWindow, elements: Iterator[T]): IterableOnce[R]
}

/** IEvictor (Core.Api/Streaming/Transformations.cs:12-23): trim a pane
  * before the window function runs (`evictBefore`) and/or trim what the
  * window RETAINS after it fires (`evictAfter`). Elements arrive
  * time-sorted. `evictAfter` is only observable where a pane survives its
  * firing — the count-trigger path (`StatefulOps.countWindow`), where
  * fire-every-N + keep-last-M composes Flink's classic sliding-count
  * window; the once-per-pane batch path fires and discards.
  */
trait Evictor[T] extends Serializable {
  def evictBefore(elements: Seq[T], window: TimeWindow): Seq[T]
  def evictAfter(elements: Seq[T], window: TimeWindow): Seq[T] = elements
}

/** Keep only the last `maxCount` elements of each pane (Flink-style
  * CountEvictor) — in both eviction positions.
  */
object CountEvictor {
  def of[T](maxCount: Int): Evictor[T] = new Evictor[T] {
    def evictBefore(elements: Seq[T], window: TimeWindow): Seq[T] =
      elements.takeRight(maxCount)
    override def evictAfter(elements: Seq[T], window: TimeWindow): Seq[T] =
      elements.takeRight(maxCount)
  }
}

/** Keep only elements within `keepMs` of the pane's newest element
  * (Flink-style TimeEvictor): evicts the stale head of each pane before
  * the window function runs. Needs the element-time extractor because the
  * evictor sees bare elements, exactly like the reference's
  * `IEvictor.EvictBefore(elements, size, window)` sees deserialized
  * records.
  */
object TimeEvictor {
  def of[T](keepMs: Long, tsMs: T => Long): Evictor[T] = new Evictor[T] {
    def evictBefore(elements: Seq[T], window: TimeWindow): Seq[T] =
      if (elements.isEmpty) elements
      else {
        val cutoff = elements.map(tsMs).max - keepMs
        elements.filter(tsMs(_) >= cutoff)
      }
  }
}

/** Entry point mirroring `StreamExecutionEnvironment`
  * (Core.Api/StreamExecutionEnvironment.cs) — sources produce DataStreams.
  */
final class StreamExecutionEnvironment(val spark: SparkSession) {
  def fromCollection[T: Encoder](data: Seq[T]): DataStream[T] =
    new DataStream(spark.createDataset(data))
  def fromDataset[T](ds: Dataset[T]): DataStream[T] = new DataStream(ds)
  def readTextFile(path: String): DataStream[String] = {
    implicit val e: Encoder[String] = Encoders.STRING
    new DataStream(spark.read.textFile(path))
  }
}
object StreamExecutionEnvironment {
  def apply(spark: SparkSession): StreamExecutionEnvironment =
    new StreamExecutionEnvironment(spark)
}
