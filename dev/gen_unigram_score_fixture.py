#!/usr/bin/env python3
"""Generate src/test/resources/unigram_scores.tsv: DuckDB-computed
integer-scaled unigram-LM scores round(ln(cnt/total)*1e6)::BIGINT over
(cnt,total) pairs, concentrated near .5 rounding boundaries.

UnigramLmSpec asserts UnigramLm.scaledLogProb == these values row for
row, so a JVM libm drift vs DuckDB's ln (which would desync the q199-201
Viterbi replays) is caught by a unit test instead of a red gate.

Run once (dev-side, where duckdb is available); output is checked in.
"""
import random

import duckdb

random.seed(0xC0FFEE)

pairs = set()
# dense small-count region (where real piece tables live)
for total in (2, 3, 7, 100, 1024, 65537, 10**6, 10**9, 10**12):
    for cnt in range(1, 200):
        if cnt <= total:
            pairs.add((cnt, total))
# random magnitudes up to 1e12
for _ in range(200_000):
    total = random.randint(2, 10**12)
    cnt = random.randint(1, total)
    pairs.add((cnt, total))

con = duckdb.connect()
con.execute("CREATE TABLE p (cnt BIGINT, total BIGINT)")
con.executemany("INSERT INTO p VALUES (?, ?)", sorted(pairs))
rows = con.execute(
    """SELECT cnt, total,
         round(ln(cnt::DOUBLE / total) * 1000000)::BIGINT AS score,
         abs(ln(cnt::DOUBLE / total) * 1000000
             - floor(ln(cnt::DOUBLE / total) * 1000000) - 0.5) AS d
       FROM p ORDER BY d, cnt, total""").fetchall()

# keep the 4000 closest to a .5 boundary + 2000 spread over the rest
keep = rows[:4000] + rows[4000::max(1, (len(rows) - 4000) // 2000)][:2000]
keep.sort()
out = "src/test/resources/unigram_scores.tsv"
with open(out, "w") as f:
    f.write("cnt\ttotal\tscore\n")
    for cnt, total, score, _ in keep:
        f.write(f"{cnt}\t{total}\t{score}\n")
print(f"wrote {len(keep)} rows to {out}")
