#!/usr/bin/env python3
"""Dev harness: A/B graft's JaroImpl semantics against DuckDB bit-exactly.

Reproduces the experiment that pinned functions/NativeJaro.scala's
transposition handling: a Python twin of JaroImpl runs over N random
string pairs and compares BIT-exact (==) with DuckDB's
jaro_winkler_similarity. With integer-halved transpositions the mismatch
count is 0; the float-halved textbook variant diverges on ~7% of pairs.

NOT shipped code — dev harness only (duckdb is a driver-side lib).
Usage: python3 tools/jaro_ab.py [n_pairs]
"""
import random
import sys

import duckdb


def jaro(sa, sb, int_half):
    la, lb = len(sa), len(sb)
    if la == 0 or lb == 0:
        return 0.0
    w = max(max(la, lb) // 2 - 1, 0)
    fa, fb = [False] * la, [False] * lb
    m = 0
    for i, c in enumerate(sa):
        for j in range(max(0, i - w), min(lb - 1, i + w) + 1):
            if not fb[j] and sb[j] == c:
                fa[i] = fb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t, j = 0, 0
    for i in range(la):
        if fa[i]:
            while not fb[j]:
                j += 1
            if sa[i] != sb[j]:
                t += 1
            j += 1
    tt = t // 2 if int_half else t / 2.0
    return (m / la + m / lb + (m - tt) / m) / 3


def jw(sa, sb, int_half):
    j = jaro(sa, sb, int_half)
    if j <= 0.7:
        return j
    l = 0
    for a, b in zip(sa[:4], sb[:4]):
        if a != b:
            break
        l += 1
    return j + l * 0.1 * (1.0 - j)


def main(n):
    random.seed(7)
    pairs = [
        ("".join(random.choices("abcde", k=random.randint(0, 10))),
         "".join(random.choices("abcde", k=random.randint(0, 10))))
        for _ in range(n)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    ref = [r[0] for r in
           con.sql("SELECT jaro_winkler_similarity(a, b) FROM p").fetchall()]
    mis_int = sum(1 for (a, b), r in zip(pairs, ref) if jw(a, b, True) != r)
    mis_flt = sum(1 for (a, b), r in zip(pairs, ref) if jw(a, b, False) != r)
    print(f"pairs={n} bit-exact mismatches: int-half={mis_int} "
          f"float-half={mis_flt}")
    assert mis_int == 0, "JaroImpl semantics drifted from the oracle!"


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3000)
