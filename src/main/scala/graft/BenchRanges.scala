package graft

/** Machine adjudication of per-query steady-state walls (VERDICT r13
  * #4): the steady-first convention said "a query is a regression only
  * if its steady exceeds its adjudicated range", but the ranges lived
  * in prose — every round-over-round move burned a human adjudication
  * cycle. The ranges are now a checked-in file
  * (`STEADY_RANGES.json`, flat `{"query": [lo, hi]}` seconds at the
  * driver's bench scale), [[Bench]] emits a `steady_verdict` per
  * measured steady query, and an `above` verdict prints a loud tail
  * line. Policy (recorded in NOTES.md): lo = 0.4×min(observed across
  * adjudicated rounds), hi = 1.5×max(observed) — wide enough for the
  * documented ±25% container jitter, tight enough that a real
  * regression fails loud; widening a range requires a NOTES entry
  * saying why. */
object BenchRanges {
  /** Parse the flat ranges file. Regex-based by design: the file is
    * repo-owned, flat and generated — `"name": [lo, hi]` pairs only —
    * so a JSON library dependency buys nothing (non-numeric-array keys
    * like `_comment` simply never match). */
  def parse(s: String): Map[String, (Double, Double)] =
    """"([^"]+)"\s*:\s*\[\s*([0-9]+(?:\.[0-9]+)?)\s*,\s*([0-9]+(?:\.[0-9]+)?)\s*\]""".r
      .findAllMatchIn(s)
      .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble))
      .toMap

  /** `above` = regression, adjudicate; `below` = faster than the
    * adjudicated floor, informational; `in_range` otherwise. */
  def verdict(v: Double, lo: Double, hi: Double): String =
    if (v > hi) "above" else if (v < lo) "below" else "in_range"

  /** Load the ranges file; absent file = no adjudication (every
    * steady query then reports `no_range`, which is itself visible). */
  def load(path: java.nio.file.Path): Map[String, (Double, Double)] =
    if (!java.nio.file.Files.exists(path)) Map.empty
    else parse(new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8))
}
