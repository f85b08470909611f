#!/usr/bin/env python3
"""Prototype: fast driver-side BPE trainer at >=1024 merges + DuckDB
min-rank apply oracle with the trained rules as a VALUES literal list.
Validates (before any Scala exists):
  1. the hash-suffix enrichment yields >=1024 learnable merges at sf0.001;
  2. a python reference fast trainer (full-scan argmax by count desc, x, y
     over UTF-8 bytes) on the byte-level segment census;
  3. the existing recursive min-rank SQL apply, fed the trained rules via
     VALUES, reproduces the python min-rank apply sequence-for-sequence;
  4. timing at 1024 rules.
"""
import duckdb, re, sys, time

SF = sys.argv[1] if len(sys.argv) > 1 else "0.001"

# ---- bytes_to_unicode (GPT-2 public bijection) ----
def bytes_to_unicode():
    bs = list(range(33, 127)) + list(range(161, 173)) + list(range(174, 256))
    cs = bs[:]
    k = 0
    for b in range(256):
        if b not in bs:
            bs.append(b); cs.append(256 + k); k += 1
    return {b: chr(c) for b, c in zip(bs, cs)}
B2U = bytes_to_unicode()

# ---- GPT-2 pre-tokenizer (ASCII-only fixture: re suffices) ----
PAT = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+(?!\S)|\s+")
def segs(text):
    return PAT.findall(text)

con = duckdb.connect()
rows = con.execute(f"""
  SELECT doc_id, source,
    text || ' q' || CAST((doc_id*2654435761) % 100000 AS VARCHAR) AS text
  FROM read_parquet('/root/testdata/sf{SF}/documents.parquet')""").fetchall()

census = {}
for _, _, text in rows:
    for s in segs(text):
        census[s] = census.get(s, 0) + 1
print(f"distinct segments: {len(census)}")

def to_syms(w):
    return [B2U[b] for b in w.encode('utf-8')]

# ---- python fast trainer: full-scan argmax (count desc, x, y by UTF-8) ----
t0 = time.time()
words = [(list(to_syms(w)), c) for w, c in census.items()]
def key8(s):
    return s.encode('utf-8')
ROUNDS = 1100
rules = []
# pair counts
pc = {}
for syms, wt in words:
    for i in range(len(syms) - 1):
        p = (syms[i], syms[i+1])
        pc[p] = pc.get(p, 0) + wt
for r in range(ROUNDS):
    if not pc:
        break
    best = min(pc.items(), key=lambda kv: (-kv[1], key8(kv[0][0]), key8(kv[0][1])))
    (x, y), n = best
    rules.append((x, y, n))
    xy = x + y
    for wi, (syms, wt) in enumerate(words):
        hit = False
        for i in range(len(syms) - 1):
            if syms[i] == x and syms[i+1] == y:
                hit = True; break
        if not hit:
            continue
        # full-word delta: decrement old pairs, rewrite greedy LTR, increment new
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i+1]); pc[p] -= wt
            if pc[p] == 0: del pc[p]
        out = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == x and syms[i+1] == y:
                out.append(xy); i += 2
            else:
                out.append(syms[i]); i += 1
        words[wi] = (out, wt)
        for i in range(len(out) - 1):
            p = (out[i], out[i+1]); pc[p] = pc.get(p, 0) + wt
print(f"trained {len(rules)} rules in {time.time()-t0:.2f}s (capacity check: >=1024? {len(rules)>=1024})")

# ---- python min-rank apply (reference for the SQL) ----
rank = {}
for i, (x, y, _) in enumerate(rules):
    rank.setdefault((x, y), i)
def apply_minrank(w):
    syms = to_syms(w)
    while len(syms) >= 2:
        best, bi = None, -1
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i+1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        x, y = rules[best][0], rules[best][1]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == x and syms[i+1] == y:
                out.append(x + y); i += 2
            else:
                out.append(syms[i]); i += 1
        syms = out
    return syms
expected = {w: apply_minrank(w) for w in census}

# ---- DuckDB recursive min-rank apply with rules as VALUES ----
def sq(s):
    return "'" + s.replace("'", "''") + "'"
rl_rows = ",".join(f"({i},{sq(x)},{sq(y)})" for i, (x, y, _) in enumerate(rules))
wd_rows = ",".join(f"({sq(w)})" for w in census)
sql = f"""WITH RECURSIVE
  wd(w) AS (VALUES {wd_rows}),
  bu AS (SELECT b, CASE WHEN printable THEN chr(CAST(b AS INTEGER))
              ELSE chr(CAST(255 + row_number()
                OVER (PARTITION BY printable ORDER BY b)
                AS INTEGER)) END AS sym
            FROM (SELECT i AS b, (i BETWEEN 33 AND 126)
                    OR (i BETWEEN 161 AND 172)
                    OR (i BETWEEN 174 AND 255) AS printable
                  FROM range(256) t(i))),
  mb AS (SELECT map_from_entries(list(struct_pack(k := b, v := sym))) AS m
         FROM bu WHERE b < 128),
  rl(rank, x, y) AS (VALUES {rl_rows}),
  rk AS (SELECT map_from_entries(list(struct_pack(
      k := x || chr(10) || y, v := rank))) AS m FROM rl),
  rx AS (SELECT map_from_entries(list(struct_pack(k := rank,
      v := struct_pack(x := x, y := y)))) AS m FROM rl),
  enc AS (
    SELECT w, flatten(list_transform(
        list_filter(string_split(w, ''), c -> c <> ''), c ->
        [mb.m[unicode(c)][1]])) AS s
      FROM wd, mb
    UNION ALL
    SELECT w, string_split(list_reduce(s, (acc, sy) -> CASE
        WHEN string_split(acc, ' ')[-1] = bx AND sy = by
        THEN substr(acc, 1, length(acc) - length(bx)) || bx || by
        ELSE acc || ' ' || sy END), ' ') AS s
    FROM (
      SELECT w, s, rx.m[br][1].x AS bx, rx.m[br][1].y AS by
      FROM (
        SELECT w, s, list_min(list_transform(
            generate_series(1, len(s) - 1),
            i -> rk.m[s[i] || chr(10) || s[i+1]][1])) AS br
        FROM enc, rk WHERE len(s) >= 2), rx
      WHERE br IS NOT NULL)),
  fin AS (SELECT w, s FROM enc, rk
    WHERE len(s) < 2 OR list_min(list_transform(
      generate_series(1, len(s) - 1),
      i -> rk.m[s[i] || chr(10) || s[i+1]][1])) IS NULL)
SELECT w, s FROM fin"""
t0 = time.time()
got = dict(con.execute(sql).fetchall())
print(f"duckdb apply: {time.time()-t0:.2f}s, {len(got)} words")
bad = 0
for w, exp in expected.items():
    if got.get(w) != exp:
        bad += 1
        if bad <= 3:
            print(f"MISMATCH {w!r}: sql={got.get(w)} py={exp}")
print("MATCH" if bad == 0 else f"FAIL: {bad} mismatches")
