package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PackedPairs.packed_pairs

/** Market-basket affinity: item co-occurrence counts with per-basket caps,
  * pairwise Jaccard / independence lift, and a window-free per-item
  * top-k neighbor table — the item-item collaborative-filtering prep
  * stage run over purchase (or co-click / co-session) logs.
  *
  * Scale design — the same bucketed-pair posture as MinHash-LSH
  * (TextDedup): baskets reduce to ONE shuffled row per basket
  * (sorted, capped item array), pairs expand IN-ROW via `packed_pairs`
  * (n·(n-1)/2 bounded by the cap², never a basket self-join), and pair
  * counts aggregate on the packed 64-bit key. A mega-basket (one
  * customer buying the whole catalog) is capped deterministically to the
  * `cap` smallest item ids — the hot-bucket df-cap argument; at crawl
  * scale the cap is what keeps the expansion O(cap²) instead of O(n²).
  * Item marginals are counted over the SAME capped rows so
  * Jaccard/lift normalizations stay consistent with the pair counts.
  *
  * The top-k neighbor stage uses the (score, id) TopKAgg — O(k) state
  * per (item, map task) — never a per-item rank window, which would
  * sort-shuffle every hot item's full candidate list through one task.
  */
object Affinity {

  /** Pairwise co-occurrence over (basket, item) rows. Output one row per
    * unordered item pair with support ≥ `minSupport`:
    * (item_a < item_b, n_pair, n_a, n_b, jaccard, lift).
    * Items must be non-negative ids < 2^32 (packed-pair contract). */
  def itemPairs(df: DataFrame, basketCol: String, itemCol: String,
                cap: Int, minSupport: Long): DataFrame = {
    val baskets = df
      .select(col(basketCol).as("__b"), col(itemCol).cast("long").as("__i"))
      .groupBy("__b")
      .agg(slice(sort_array(collect_set(col("__i"))), 1, cap).as("__items"))
    val pairCnt = baskets
      .select(explode(packed_pairs(col("__items"))).as("__p"))
      .groupBy("__p").agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minSupport)
    val itemCnt = baskets
      .select(explode(col("__items")).as("__i"))
      .groupBy("__i").agg(count(lit(1)).as("__n"))
    val nBaskets = baskets.agg(count(lit(1)).as("__nb"))
    pairCnt
      .select(shiftrightunsigned(col("__p"), 32).as("item_a"),
        (col("__p").bitwiseAND(lit(0xFFFFFFFFL))).as("item_b"),
        col("n_pair"))
      .join(itemCnt.withColumnRenamed("__i", "item_a")
        .withColumnRenamed("__n", "n_a"), "item_a")
      .join(itemCnt.withColumnRenamed("__i", "item_b")
        .withColumnRenamed("__n", "n_b"), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_pair"), col("n_a"),
        col("n_b"),
        (col("n_pair").cast("double") /
          (col("n_a") + col("n_b") - col("n_pair"))).as("jaccard"),
        (col("n_pair").cast("double") * col("__nb") /
          (col("n_a").cast("double") * col("n_b"))).as("lift"))
  }

  /** Length-3 event-path counts over each user's EARLIEST `cap` events —
    * sequence mining with the hot-user cap applied BEFORE any per-user
    * collection: TopKAgg on exact negated epoch-µs keeps O(cap) state per
    * (user, map task) where a row_number window would sort-shuffle a
    * mega-user's full history through one task; the trigram expansion
    * then runs in-row over a ≤cap array. Ties break by event id, i.e.
    * ORDER BY ts, id. Output: (path "a>b>c", n). */
  def eventPaths(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, typeCol: String, cap: Int): DataFrame = {
    val topk = graft.functions.TopKAgg.columnAgg(cap)
    val sel = events
      .select(col(userCol), col(idCol),
        unix_micros(col(tsCol)).cast("double").as("__t"))
      .groupBy(col(userCol))
      .agg(topk(col("__t") * lit(-1.0), col(idCol).cast("long")).as("__tk"))
      .select(col(userCol), explode(col("__tk")).as("e"))
      .select(col(userCol), col("e._2").as(idCol))
    events.join(sel, Seq(userCol, idCol))
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol), col(idCol),
        col(typeCol).as("__ty")))).as("__s"))
      .select(explode(expr(
        "CASE WHEN size(__s) >= 3 THEN transform(" +
        "sequence(1, size(__s) - 2), i -> concat_ws('>', " +
        "__s[i-1].__ty, __s[i].__ty, __s[i+1].__ty)) " +
        "ELSE CAST(array() AS ARRAY<STRING>) END")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
  }

  /** Per-item top-k neighbors by lift from the symmetric closure of
    * [[itemPairs]] output — window-free (TopKAgg, ties break to the
    * smaller neighbor id). Output: (item, rank 1..k, neighbor, lift). */
  def similarItems(pairs: DataFrame, k: Int): DataFrame = {
    val sym = pairs.select(col("item_a").as("item"),
        col("item_b").as("nb"), col("lift"))
      .unionAll(pairs.select(col("item_b").as("item"),
        col("item_a").as("nb"), col("lift")))
    val topk = graft.functions.TopKAgg.columnAgg(k)
    sym.groupBy("item")
      .agg(topk(col("lift"), col("nb")).as("__tk"))
      .select(col("item"), posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(col("item"), (col("__pos") + 1).cast("bigint").as("rank"),
        col("__e._2").as("neighbor"), col("__e._1").as("lift"))
  }
}
