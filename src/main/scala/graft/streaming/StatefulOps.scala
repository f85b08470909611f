package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed-state operators (SURVEY §2.8) over `GroupState` — the Spark
  * equivalent of the reference's `IValueState/IListState/IMapState` scoped
  * by current key (BasicRuntimeContext.cs:60-119). State lives in the state
  * store (HDFS/RocksDB provider), checkpointed per micro-batch; at scale the
  * store shards by the grouping key's hash partitioning, so state access
  * never crosses executors.
  */
object StatefulOps {

  /** Count windows: the reference's `GlobalWindows` + count trigger
    * (SURVEY §7.4 "GlobalWindows + custom trigger"). Emits an aggregate for
    * every `size` elements per key; remainder stays in state (a count
    * trigger never fires a partial pane).
    *
    * `evictor`: what the pane RETAINS after firing is
    * `evictor.evictAfter(pane)` — `None` purges (Fire+Purge, the previous
    * fixed behavior), while e.g. `CountEvictor.of(m)` keeps the last m
    * elements so consecutive firings overlap: Flink's sliding-count window
    * (`countWindow(size, slide)` ≡ fire every `size-m` with `m` carried).
    */
  def countWindow[K, V, OUT](grouped: KeyValueGroupedDataset[K, V], size: Int,
                             evictor: Option[graft.datastream.Evictor[V]] = None)(
      aggregate: (K, Seq[V]) => OUT)(
      implicit stateEnc: Encoder[Seq[V]], outEnc: Encoder[OUT]): Dataset[OUT] = {
    val globalWindow = graft.windowing.TimeWindow(Long.MinValue, Long.MaxValue)
    grouped.flatMapGroupsWithState[Seq[V], OUT](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (key: K, values: Iterator[V], state: GroupState[Seq[V]]) =>
        var pane = state.getOption.getOrElse(Seq.empty[V])
        val fired = scala.collection.mutable.ArrayBuffer.empty[OUT]
        values.foreach { v =>
          pane :+= v
          if (pane.size >= size) {
            fired += aggregate(key, pane)
            pane = evictor.fold(Seq.empty[V])(_.evictAfter(pane, globalWindow))
          }
        }
        state.update(pane)
        fired.iterator
    }
  }

  /** Running per-key value state (IValueState<T> via GetValueState,
    * IRuntimeContext.cs:13-84): fold every element into state, emit the
    * updated value per element batch.
    */
  def mapWithState[K, V, S, OUT](grouped: KeyValueGroupedDataset[K, V])(
      zero: S)(fold: (S, V) => S)(emit: (K, S) => OUT)(
      implicit stateEnc: Encoder[S], outEnc: Encoder[OUT]): Dataset[OUT] =
    grouped.mapGroupsWithState[S, OUT](GroupStateTimeout.NoTimeout()) {
      (key: K, values: Iterator[V], state: GroupState[S]) =>
        val s = values.foldLeft(state.getOption.getOrElse(zero))(fold)
        state.update(s)
        emit(key, s)
    }

  /** Processing-time session/inactivity timeout (ITimerService processing-
    * time timers, ITimerService.cs:11-37): emit the accumulated state when a
    * key has been idle for `timeoutMs`.
    */
  def processTimeTimeoutAggregate[K, V, S, OUT](
      grouped: KeyValueGroupedDataset[K, V], timeoutMs: Long)(
      zero: S)(fold: (S, V) => S)(emit: (K, S) => OUT)(
      implicit stateEnc: Encoder[S], outEnc: Encoder[OUT]): Dataset[OUT] =
    grouped.flatMapGroupsWithState[S, OUT](
      OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
      (key: K, values: Iterator[V], state: GroupState[S]) =>
        if (state.hasTimedOut) {
          val out = emit(key, state.get)
          state.remove()
          Iterator.single(out)
        } else {
          val s = values.foldLeft(state.getOption.getOrElse(zero))(fold)
          state.update(s)
          state.setTimeoutDuration(timeoutMs)
          Iterator.empty
        }
    }
}
