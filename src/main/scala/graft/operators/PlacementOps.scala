package graft.operators

import org.apache.spark.rdd.{PartitionCoalescer, PartitionGroup, RDD}

/** P7 — stream-split assignment (reference:
  * `AM/ApplicationMaster.java:1122-1160` `allocateInputStreamSplits()`):
  * input splits are dealt to the fixed worker set either as contiguous
  * blocks (default) or round-robin when `hbox.input.stream.shuffle` is set
  * (`:1134-1141`).
  *
  * Spark-first mapping: a split is a partition and a worker is a task, so
  * the deal is a `coalesce` with a custom [[PartitionCoalescer]] — a
  * *narrow* dependency. No rows move over the network (each output task
  * reads its input partitions where they are), the grouping is
  * deterministic (pure function of partition index, stable under task
  * retry), and both reference layouts fall out of one index function:
  *
  *   - contiguous: worker i gets partitions [i·n/w … (i+1)·n/w), remainder
  *     dealt one-per-worker from the front — the reference's nsplit/msplit
  *     loop verbatim
  *   - roundRobin: partition i goes to worker i % w (`index = i % splitWorkerNum`)
  *
  * This replaces the earlier documented `orderBy(rand(seed))` mapping,
  * which paid a full shuffle + sort for what is an assignment decision.
  * Row-level (not split-level) rebalancing remains `df.repartition(n)`
  * when callers genuinely need it.
  */
object PlacementOps {

  /** Deal `rdd`'s partitions to `workers` groups as contiguous blocks
    * (reference default). Narrow — no shuffle. */
  def dealContiguous[T](rdd: RDD[T], workers: Int): RDD[T] =
    rdd.coalesce(workers, shuffle = false,
      partitionCoalescer = Some(new DealCoalescer(roundRobin = false)))

  /** Deal `rdd`'s partitions to `workers` groups round-robin
    * (reference `HBOX_INPUT_STREAM_SHUFFLE=true`). Narrow — no shuffle. */
  def dealRoundRobin[T](rdd: RDD[T], workers: Int): RDD[T] =
    rdd.coalesce(workers, shuffle = false,
      partitionCoalescer = Some(new DealCoalescer(roundRobin = true)))

  /** Deterministic split→worker deal; both reference layouts. */
  private[graft] class DealCoalescer(roundRobin: Boolean)
      extends PartitionCoalescer with Serializable {
    override def coalesce(maxPartitions: Int, parent: RDD[_]): Array[PartitionGroup] = {
      val n = parent.partitions.length
      val w = math.min(maxPartitions, math.max(1, n))
      // pure index assignment first (both reference layouts), then groups
      // seeded with their first split's preferred location so the scheduler
      // can still place each worker-task near its data
      val assignment: Seq[Seq[Int]] =
        if (roundRobin) (0 until w).map(g => g until n by w)
        else {
          // reference nsplit/msplit: each worker a block of n/w, first n%w
          // workers one extra — identical contiguous ranges
          val nsplit = n / w
          val msplit = n % w
          (0 until w).map { i =>
            val start = i * nsplit + math.min(i, msplit)
            start until (start + nsplit + (if (i < msplit) 1 else 0))
          }
        }
      assignment.map { idxs =>
        val pg = new PartitionGroup(
          idxs.headOption.flatMap(i =>
            parent.preferredLocations(parent.partitions(i)).headOption))
        idxs.foreach(i => pg.partitions += parent.partitions(i))
        pg
      }.toArray
    }
  }
}
