package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming._

/** Typed per-key map state, mirroring the reference's `IMapState<TK,TV>`
  * (FlinkDotNet.Core.Abstractions/States/IMapState.cs:11-77): get/put/
  * putAll/contains/remove/keys/values/entries/isEmpty/clear scoped to the
  * current grouping key. Backed by Spark's `MapState` (transformWithState),
  * so entries live in the state store — RocksDB at scale — sharded by the
  * grouping key's hash partitioning, and each map entry is an individual
  * store key: point lookups never load the whole map.
  */
trait GraftMapState[MK, MV] {
  def get(k: MK): Option[MV]
  def put(k: MK, v: MV): Unit
  def putAll(m: Iterable[(MK, MV)]): Unit
  def contains(k: MK): Boolean
  def remove(k: MK): Unit
  def keys(): Iterator[MK]
  def values(): Iterator[MV]
  def entries(): Iterator[(MK, MV)]
  def isEmpty: Boolean
  def clear(): Unit
}

/** Typed per-key list state, mirroring `IListState<T>`
  * (FlinkDotNet.Core.Abstractions/States/IListState.cs:10-46):
  * getValues/add/addAll/update/clear. Backed by Spark's `ListState` —
  * appends are O(1) store writes, no read-modify-write of the whole list.
  */
trait GraftListState[T] {
  def getValues(): Iterator[T]
  def add(v: T): Unit
  def addAll(vs: Iterable[T]): Unit
  def update(vs: Iterable[T]): Unit
  def clear(): Unit
}

private[streaming] final class SparkMapStateAdapter[MK, MV](s: MapState[MK, MV])
    extends GraftMapState[MK, MV] {
  // containsKey-then-get rather than Option(get): a primitive-typed MV
  // would unbox the store's absent-null into a phantom zero
  def get(k: MK): Option[MV] = if (s.containsKey(k)) Some(s.getValue(k)) else None
  def put(k: MK, v: MV): Unit = s.updateValue(k, v)
  def putAll(m: Iterable[(MK, MV)]): Unit = m.foreach { case (k, v) => s.updateValue(k, v) }
  def contains(k: MK): Boolean = s.containsKey(k)
  def remove(k: MK): Unit = s.removeKey(k)
  def keys(): Iterator[MK] = s.keys()
  def values(): Iterator[MV] = s.values()
  def entries(): Iterator[(MK, MV)] = s.iterator()
  def isEmpty: Boolean = !s.exists()
  def clear(): Unit = s.clear()
}

private[streaming] final class SparkListStateAdapter[T](s: ListState[T])
    extends GraftListState[T] {
  def getValues(): Iterator[T] = s.get()
  def add(v: T): Unit = s.appendValue(v)
  def addAll(vs: Iterable[T]): Unit = if (vs.nonEmpty) s.appendList(vs.toArray[Any].asInstanceOf[Array[T]])
  def update(vs: Iterable[T]): Unit =
    if (vs.isEmpty) s.clear() else s.put(vs.toArray[Any].asInstanceOf[Array[T]])
  def clear(): Unit = s.clear()
}

/** Keyed-state process operators surfacing the reference's MapState /
  * ListState contracts over `transformWithState`. Complements
  * `StatefulOps.mapWithState` (value-state fold): these give the user the
  * state HANDLE, for per-key-dictionary and per-key-buffer logic that a
  * fold can't express (e.g. distinct counting, manual pane management).
  */
object KeyedStateOps {

  /** Process each per-key input slice with access to a named per-key map
    * state. `process` returns the rows to emit for this slice.
    */
  def processWithMapState[K, V, MK, MV, OUT](
      grouped: KeyValueGroupedDataset[K, V])(
      process: (K, Iterator[V], GraftMapState[MK, MV]) => Iterator[OUT])(
      implicit mkEnc: Encoder[MK], mvEnc: Encoder[MV],
      outEnc: Encoder[OUT]): Dataset[OUT] = {
    val processor = new StatefulProcessor[K, V, OUT] {
      @transient private var ms: MapState[MK, MV] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        ms = getHandle.getMapState[MK, MV]("map", mkEnc, mvEnc, TTLConfig.NONE)
      override def handleInputRows(key: K, rows: Iterator[V],
                                   timers: TimerValues): Iterator[OUT] =
        process(key, rows, new SparkMapStateAdapter(ms))
    }
    grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }

  /** Process each per-key input slice with access to a named per-key list
    * state.
    */
  def processWithListState[K, V, T, OUT](
      grouped: KeyValueGroupedDataset[K, V])(
      process: (K, Iterator[V], GraftListState[T]) => Iterator[OUT])(
      implicit tEnc: Encoder[T], outEnc: Encoder[OUT]): Dataset[OUT] = {
    val processor = new StatefulProcessor[K, V, OUT] {
      @transient private var ls: ListState[T] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        ls = getHandle.getListState[T]("list", tEnc, TTLConfig.NONE)
      override def handleInputRows(key: K, rows: Iterator[V],
                                   timers: TimerValues): Iterator[OUT] =
        process(key, rows, new SparkListStateAdapter(ls))
    }
    grouped.transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }
}
