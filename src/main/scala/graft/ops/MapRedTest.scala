package graft.ops

/** In-process test drivers for mapper/reducer closures (SURVEY.md §5.1
  * — the `mapredtest` idiom: MapDriver / ReduceDriver /
  * MapReduceDriver). Feed (k, v) lists, assert on outputs, no
  * SparkSession anywhere: the simulated shuffle groups by key and
  * iterates keys in sorted order, matching the Hadoop contract that
  * [[MapRed]] mirrors, so a user closure unit-tested here drops into
  * `MapRed.mapRecords` / `reduceRecords` / `combineByKey` unchanged.
  */
object MapRedTest {

  /** Run a mapper (C1 shape) over an input list, collect its outputs
    * in order.
    */
  final case class MapDriver[K, V, K2, V2](f: (K, V) => IterableOnce[(K2, V2)]) {
    def run(input: Seq[(K, V)]): Seq[(K2, V2)] =
      input.flatMap { case (k, v) => f(k, v).iterator }
  }

  /** Run a reducer (C2 shape) over an input list: group by key,
    * iterate keys in sorted order (the simulated shuffle), values in
    * input order within each key (set `sortValues` for the J3
    * secondary-sort contract).
    */
  final case class ReduceDriver[K, V, K2, V2](
      f: (K, Iterator[V]) => IterableOnce[(K2, V2)],
      sortValues: Option[Ordering[V]] = None)(implicit ord: Ordering[K]) {
    def run(input: Seq[(K, V)]): Seq[(K2, V2)] =
      input.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (k, kvs) =>
        val vs = kvs.map(_._2)
        f(k, sortValues.fold(vs)(o => vs.sorted(o)).iterator).iterator
      }
  }

  /** Full pipeline driver: mapper → optional combiner (grouped
    * pre-merge, the C3 map-side contract) → simulated shuffle →
    * reducer. The combiner must be commutative-associative — exactly
    * the law `MapRed.combineByKey` assumes — so driving with and
    * without it must agree; a mismatch here is the bug this driver
    * exists to catch.
    */
  final case class MapReduceDriver[K, V, K2, V2, K3, V3](
      mapper: (K, V) => IterableOnce[(K2, V2)],
      reducer: (K2, Iterator[V2]) => IterableOnce[(K3, V3)],
      combiner: Option[(V2, V2) => V2] = None)(implicit ord: Ordering[K2]) {
    def run(input: Seq[(K, V)]): Seq[(K3, V3)] = {
      val mapped = input.flatMap { case (k, v) => mapper(k, v).iterator }
      val shuffled = combiner match {
        case Some(m) =>
          mapped.groupBy(_._1).toSeq.map { case (k, kvs) => (k, kvs.map(_._2).reduce(m)) }
        case None => mapped
      }
      ReduceDriver[K2, V2, K3, V3](reducer).run(shuffled)
    }
  }
}
