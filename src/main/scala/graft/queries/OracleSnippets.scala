package graft.queries

/** Shared DuckDB-oracle SQL fragments for the vector rows. Five round-13
  * rows (s05, s07, s52, s53, io25) each carried hand-duplicated copies
  * of the strict in-order cosine/distance folds and the literal
  * plane/centroid VALUES builders — one missed copy during a future fix
  * to the fold shape (e.g. the CAST discipline that makes the dot
  * product bit-exact) would become a silent oracle divergence. The
  * builders produce the exact canonical text those rows gated green
  * with. Pre-round-13 rows (s16/s17/s28/s21/…) keep their committed
  * strings untouched — byte-stable oracles are part of their history —
  * and can migrate opportunistically when next edited.
  */
private[queries] object OracleSnippets {

  /** `(r, [v1, v2, …])` VALUES rows for a seeded plane/centroid matrix
    * (shortest-roundtrip double literals re-parse to identical bits). */
  def matrixValues(rows: Seq[Seq[Double]]): String =
    rows.zipWithIndex
      .map { case (p, r) => s"($r, [${p.mkString(", ")}])" }
      .mkString(",\n        ")

  /** Strict in-order dot-product fold of `a[i] * b[i]` over dims. */
  def dotFold(a: String, b: String, dims: Int): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, $dims + 1),
       |             i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |           (a, x) -> a + x)""".stripMargin

  /** Strict in-order squared-distance fold of a float vector against a
    * literal centroid column (centroid elements are already DOUBLE). */
  def dist2Fold(vec: String, cent: String, dims: Int): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(1, $dims + 1),
       |             i -> (CAST($vec[i] AS DOUBLE) - $cent[i])
       |                  * (CAST($vec[i] AS DOUBLE) - $cent[i]))),
       |           (a, x) -> a + x)""".stripMargin

  /** Exact cosine between two embedding columns: the dot fold over the
    * product of the two norm folds — the op order every vector oracle
    * in the registry uses (bit-parity with Similarity.dot/l2norm). */
  def cosineFold(a: String, b: String, dims: Int): String =
    s"""${dotFold(a, b, dims)}
       |         / (sqrt(${dotFold(a, a, dims)})
       |            * sqrt(${dotFold(b, b, dims)}))""".stripMargin

  /** `CASE j WHEN 0 THEN 1 … END` packing a sign bit j into 2^j. */
  def bitCase(bits: Int): String =
    (0 until bits).map(j => s"WHEN $j THEN ${1L << j}").mkString(" ")
}
