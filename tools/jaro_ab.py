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
    # three alphabets: ASCII, BMP multibyte (2- and 3-byte UTF-8), and
    # non-BMP (4-byte, surrogate pairs in UTF-16). DuckDB's kernel runs
    # over UTF-8 BYTES: the byte-level twin below is bit-exact on ALL
    # alphabets, while a code-point twin matches only on ASCII — that
    # experiment pinned JaroImpl to UTF8String.getBytes.
    for name, alpha in [("ascii", "abcde"), ("bmp", "abéñ日本語ß"),
                        ("nonbmp", "ab🦀🎉é日")]:
        pairs = [
            ("".join(random.choices(alpha, k=random.randint(0, 10))),
             "".join(random.choices(alpha, k=random.randint(0, 10))))
            for _ in range(n)
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
        con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
        ref = [r[0] for r in
               con.sql("SELECT jaro_winkler_similarity(a, b) FROM p")
               .fetchall()]
        # byte twin = JaroImpl's view (UTF-8 code units)
        mis_b = sum(1 for (a, b), r in zip(pairs, ref)
                    if jw(list(a.encode()), list(b.encode()), True) != r)
        mis_int = sum(1 for (a, b), r in zip(pairs, ref)
                      if jw(a, b, True) != r)
        mis_flt = sum(1 for (a, b), r in zip(pairs, ref)
                      if jw(a, b, False) != r)
        print(f"{name}: pairs={n} bit-exact mismatches: utf8-bytes={mis_b} "
              f"codepoint-int-half={mis_int} codepoint-float-half={mis_flt}")
        assert mis_b == 0, "JaroImpl byte semantics drifted from the oracle!"


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3000)
