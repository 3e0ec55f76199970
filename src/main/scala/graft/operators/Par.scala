package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** CPU-parallelism fan-out for kernel-dense stages (optimization
  * guide §2.5-2.6, §1.2 "the distributed algorithm first").
  *
  * The engine's hot map/verify stages are BYTE-thin but CPU-dense —
  * packed gram arrays, 301-way deletion-variant explodes, JSON
  * parses, per-pair merge kernels — which defeats both of Spark's
  * partitioning heuristics at once:
  *
  *  - a table below `maxPartitionBytes` (or with one row group) scans
  *    as ONE task no matter how much per-row compute sits on top of
  *    the scan, so the whole map side of a query runs on one core;
  *  - AQE's post-shuffle coalescing targets BYTES
  *    (`advisoryPartitionSizeInBytes` / `minPartitionSize`), so a
  *    600 KB shuffle feeding a quadratic pair verify coalesces to one
  *    task — measured r20: the d_lsh_recall truth join ran 2.6 s on a
  *    single task over a 641 KB shuffle read.
  *
  * Both serialize 31 of 32 cores exactly where the engine spends its
  * CPU. The remedies here are deliberately shaped to be NO-OPS at
  * scale, where the scan/shuffle is already wide:
  *
  *  - [[fan]] hash-repartitions to the session's default parallelism
  *    when (and only when) the current plan has fewer partitions than
  *    cores — the gate reads the PLANNED partition count, so a 100 TB
  *    fact (thousands of scan tasks) never pays a second full-fact
  *    exchange, while a one-file local scan spreads its per-row work
  *    across the machine for the cost of shuffling a few MB.
  *  - [[slices]] is the explicit width for kernel self-joins whose
  *    blocking relation is repartitioned by join key anyway: a few
  *    slices per core bounds the worst task at ~1/(4·cores) of the
  *    kernel mass (the r20 profile's hot-task wall: 24 AQE-coalesced
  *    partitions put 1.87 s of a 1.88 s stage on one task), and an
  *    explicit `repartition(n, keys)` both pre-positions the relation
  *    so the self-join needs ZERO further exchanges and keeps AQE
  *    from re-coalescing the kernel stage by bytes.
  */
private[graft] object Par {

  /** Kernel-stage width: a few slices per core. On a cluster
    * `defaultParallelism` tracks total executor cores, so this stays
    * "4 waves of tasks" at any deployment size — partitions stay in
    * the 100 MB-1 GB band once the data is big (e.g. the sf10 fat
    * banding relation at 10.7 GB / 128 slices ≈ 84 MB per slice).
    */
  def slices(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism * SliceWaves

  /** Task waves per kernel stage. 1 = one task per core: per-task
    * fixed costs (plan deserialization, codegen cache lookup, shuffle
    * fetch setup — measured ~100-200 ms/task on the r20 sandbox) are
    * paid once per core, at the price of coarser skew smoothing; the
    * measured A/B at sf0.1 (d_edit_dup / d_lsh_jaccard / d_minhash_est)
    * put waves=4's overhead above its skew win at every tested query.
    */
  private val SliceWaves: Int =
    sys.env.getOrElse("SPARK_GRAFT_SLICE_WAVES", "1").toInt

  /** Hash fan-out by `cols` to session parallelism when the plan is
    * narrower than the session's core count; identity otherwise.
    * Use on small scans feeding expensive per-row expressions.
    */
  def fan(df: DataFrame, cols: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, cols: _*) else df
  }
}
