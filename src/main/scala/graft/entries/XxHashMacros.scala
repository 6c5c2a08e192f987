package graft.entries

/**
 * Spark-compatible XXH64 as DuckDB SQL macros — the oracle replay of the
 * production hash family (`org.apache.spark.sql.catalyst.expressions.XXH64`,
 * itself the public xxHash64 algorithm with Spark's per-type seed
 * chaining). Validated value-exactly against Spark's `xxhash64` across
 * string lengths 0–100 (all four tail phases + the 32-byte stripe loop +
 * multi-byte UTF-8) and int/long/negative-seed chains in
 * tools/xxh_oracle_check.py.
 *
 * All arithmetic runs in HUGEINT lanes kept in [0, 2^64): 64-bit wrap
 * multiply is decomposed into 32-bit halves (each partial < 2^64, sums
 * < 2^65 — never near the signed-128 limit), rotations are
 * `(x·2^r mod 2^64) + x//2^(64-r)`, xor round-trips through UBIGINT.
 *
 * Two DuckDB constraints shape the spelling:
 *  - macro arguments substitute TEXTUALLY (an argument used twice is
 *    evaluated twice; nested macros would blow up exponentially), and
 *  - scalar subqueries are forbidden inside lambda bodies (and the
 *    minhash/fingerprint oracles need these macros inside
 *    `list_reduce`/`list_transform` lambdas).
 * Both are solved by the same device: a let-binding spelled
 * `list_transform([expr], v -> body)[1]` — binds once, legal in lambdas,
 * no subqueries.
 *
 * Constants: PRIME64_1..5 = 11400714785074694791, 14029467366897019727,
 * 1609587929392839161, 9650029242287828579, 2870177450012600261;
 * rotation pairs (2^r, 2^(64-r)) are pre-folded literals.
 */
private[graft] object XxHashMacros {

  /** `CREATE OR REPLACE MACRO` preamble — prepend to an oracle query
    * (the driver runs every oracle on one connection; OR REPLACE keeps
    * repeated preambles idempotent). */
  val Sql: String = """
CREATE OR REPLACE MACRO xx_mul(a0, b0) AS
  list_transform([CAST(a0 AS HUGEINT)], a ->
    list_transform([CAST(b0 AS HUGEINT)], b ->
      ((a % 4294967296) * (b % 4294967296)
       + ((((a % 4294967296) * (b // 4294967296)
           + (a // 4294967296) * (b % 4294967296)) % 4294967296)
          * 4294967296)) % 18446744073709551616)[1])[1];
CREATE OR REPLACE MACRO xx_xor(a, b) AS
  CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT);
CREATE OR REPLACE MACRO xx_rot(a0, p, q) AS
  list_transform([CAST(a0 AS HUGEINT)], a ->
    (xx_mul(a, p) + (a // CAST(q AS HUGEINT))) % 18446744073709551616)[1];
CREATE OR REPLACE MACRO xx_fmix(h0) AS
  list_transform([CAST(h0 AS HUGEINT)], h1 ->
    list_transform([xx_mul(xx_xor(h1, h1 // 8589934592),
                           14029467366897019727)], h3 ->
      list_transform([xx_mul(xx_xor(h3, h3 // 536870912),
                             1609587929392839161)], h5 ->
        xx_xor(h5, h5 // 4294967296))[1])[1])[1];
CREATE OR REPLACE MACRO xx_u64(l0) AS
  list_transform([CAST(l0 AS HUGEINT)], l ->
    l + CASE WHEN l < 0 THEN 18446744073709551616 ELSE 0 END)[1];
CREATE OR REPLACE MACRO xx_signed(h0) AS
  list_transform([CAST(h0 AS HUGEINT)], h ->
    CAST(CASE WHEN h >= 9223372036854775808
         THEN h - 18446744073709551616 ELSE h END AS BIGINT))[1];
CREATE OR REPLACE MACRO xx_round0(w0) AS
  list_transform([CAST(w0 AS HUGEINT)], w ->
    xx_mul(xx_rot(xx_mul(w, 14029467366897019727), 2147483648, 8589934592),
           11400714785074694791))[1];
CREATE OR REPLACE MACRO xx_long(l, seed) AS
  xx_fmix(
    (xx_mul(xx_rot(
       xx_xor((CAST(seed AS HUGEINT) + 2870177450012600269)
                % 18446744073709551616,
              xx_round0(xx_u64(l))),
       134217728, 137438953472),
     11400714785074694791) + 9650029242287828579) % 18446744073709551616);
CREATE OR REPLACE MACRO xx_int(i0, seed) AS
  list_transform([CAST(i0 AS HUGEINT)], i ->
    xx_fmix(
      (xx_mul(xx_rot(
         xx_xor((CAST(seed AS HUGEINT) + 2870177450012600265)
                  % 18446744073709551616,
                xx_mul(i % 4294967296
                       + CASE WHEN i < 0 THEN 4294967296 ELSE 0 END,
                       11400714785074694791)),
         8388608, 2199023255552),
       14029467366897019727) + 1609587929392839161)
      % 18446744073709551616))[1];
CREATE OR REPLACE MACRO xx_bytes(s) AS
  list_transform([hex(encode(CAST(s AS VARCHAR)))], hx ->
    list_transform(range(length(hx) // 2), i ->
      CAST(CAST(('0x' || substr(hx, CAST(2 * i + 1 AS INTEGER), 2))
           AS UBIGINT) AS HUGEINT)))[1];
CREATE OR REPLACE MACRO xx_w64(bl, o0) AS
  list_transform([CAST(o0 AS BIGINT)], o ->
    CAST(bl AS HUGEINT[])[CAST(o + 1 AS INTEGER)]
    + CAST(bl AS HUGEINT[])[CAST(o + 2 AS INTEGER)] * 256
    + CAST(bl AS HUGEINT[])[CAST(o + 3 AS INTEGER)] * 65536
    + CAST(bl AS HUGEINT[])[CAST(o + 4 AS INTEGER)] * 16777216
    + CAST(bl AS HUGEINT[])[CAST(o + 5 AS INTEGER)] * 4294967296
    + CAST(bl AS HUGEINT[])[CAST(o + 6 AS INTEGER)] * 1099511627776
    + CAST(bl AS HUGEINT[])[CAST(o + 7 AS INTEGER)] * 281474976710656
    + CAST(bl AS HUGEINT[])[CAST(o + 8 AS INTEGER)] * 72057594037927936)[1];
CREATE OR REPLACE MACRO xx_w32(bl, o0) AS
  list_transform([CAST(o0 AS BIGINT)], o ->
    CAST(bl AS HUGEINT[])[CAST(o + 1 AS INTEGER)]
    + CAST(bl AS HUGEINT[])[CAST(o + 2 AS INTEGER)] * 256
    + CAST(bl AS HUGEINT[])[CAST(o + 3 AS INTEGER)] * 65536
    + CAST(bl AS HUGEINT[])[CAST(o + 4 AS INTEGER)] * 16777216)[1];
CREATE OR REPLACE MACRO xx_lane(v0, w0) AS
  list_transform([CAST(v0 AS HUGEINT)], v ->
    list_transform([CAST(w0 AS HUGEINT)], w ->
      xx_mul(xx_rot((v + xx_mul(w, 14029467366897019727))
                      % 18446744073709551616, 2147483648, 8589934592),
             11400714785074694791))[1])[1];
CREATE OR REPLACE MACRO xx_accs(bl, seed0) AS
  list_transform([CAST(seed0 AS HUGEINT)], seed ->
    list_reduce(
      list_prepend(
        [(seed + 11400714785074694791 + 14029467366897019727)
           % 18446744073709551616,
         (seed + 14029467366897019727) % 18446744073709551616,
         seed,
         (seed + 18446744073709551616 - 11400714785074694791)
           % 18446744073709551616],
        list_transform(range(len(CAST(bl AS HUGEINT[])) // 32), st ->
          [xx_w64(bl, st * 32), xx_w64(bl, st * 32 + 8),
           xx_w64(bl, st * 32 + 16), xx_w64(bl, st * 32 + 24)])),
      (acc, st) -> [xx_lane(acc[1], st[1]), xx_lane(acc[2], st[2]),
                    xx_lane(acc[3], st[3]), xx_lane(acc[4], st[4])]))[1];
CREATE OR REPLACE MACRO xx_mergeround(h0, v0) AS
  list_transform([CAST(h0 AS HUGEINT)], h ->
    (xx_mul(xx_xor(h, xx_round0(v0)), 11400714785074694791)
     + 9650029242287828579) % 18446744073709551616)[1];
CREATE OR REPLACE MACRO xx_merged(a0) AS
  list_transform([CAST(a0 AS HUGEINT[])], a ->
    xx_mergeround(xx_mergeround(xx_mergeround(xx_mergeround(
      (xx_rot(a[1], 2, 9223372036854775808)
       + xx_rot(a[2], 128, 144115188075855872)
       + xx_rot(a[3], 4096, 4503599627370496)
       + xx_rot(a[4], 262144, 70368744177664)) % 18446744073709551616,
      a[1]), a[2]), a[3]), a[4]))[1];
CREATE OR REPLACE MACRO xx_h0(bl, seed) AS
  CASE WHEN len(CAST(bl AS HUGEINT[])) >= 32 THEN xx_merged(xx_accs(bl, seed))
       ELSE (CAST(seed AS HUGEINT) + 2870177450012600261)
            % 18446744073709551616 END;
CREATE OR REPLACE MACRO xx_wtail(bl, h) AS
  list_reduce(
    list_prepend(CAST(h AS HUGEINT),
      list_transform(range((len(CAST(bl AS HUGEINT[])) % 32) // 8), k ->
        xx_w64(bl, (len(CAST(bl AS HUGEINT[])) // 32) * 32 + k * 8))),
    (a, w) -> (xx_mul(xx_rot(xx_xor(a, xx_round0(w)), 134217728, 137438953472),
                      11400714785074694791)
               + 9650029242287828579) % 18446744073709551616);
CREATE OR REPLACE MACRO xx_itail(bl, h) AS
  CASE WHEN len(CAST(bl AS HUGEINT[])) % 8 >= 4 THEN
    (xx_mul(xx_rot(xx_xor(CAST(h AS HUGEINT),
                          xx_mul(xx_w32(bl, (len(CAST(bl AS HUGEINT[])) // 8) * 8),
                                 11400714785074694791)),
                   8388608, 2199023255552),
            14029467366897019727) + 1609587929392839161) % 18446744073709551616
  ELSE CAST(h AS HUGEINT) END;
CREATE OR REPLACE MACRO xx_btail(bl, h) AS
  list_reduce(
    list_prepend(CAST(h AS HUGEINT),
      CAST(bl AS HUGEINT[])[CAST((len(CAST(bl AS HUGEINT[])) // 4) * 4 + 1
                                 AS INTEGER):]),
    (a, b) -> xx_mul(xx_rot(xx_xor(a, xx_mul(b, 2870177450012600261)),
                            2048, 9007199254740992),
                     11400714785074694791));
CREATE OR REPLACE MACRO xx_strh_bl(bl0, seed) AS
  list_transform([CAST(bl0 AS HUGEINT[])], bl ->
    xx_fmix(xx_btail(bl, xx_itail(bl, xx_wtail(bl,
      (xx_h0(bl, seed) + len(bl)) % 18446744073709551616)))))[1];
CREATE OR REPLACE MACRO xx_strh(s, seed) AS xx_strh_bl(xx_bytes(s), seed);
CREATE OR REPLACE MACRO xx_str(s, seed) AS xx_signed(xx_strh(s, seed));
"""
}
