#!/usr/bin/env python3
# Working file for ISO 11172-3 Table B.7 Huffman table verification.
# Data below is RECALLED public-standard table data (the ISO tables as
# they appear in every public decoder). Each table is checked for
# (a) v < 2^L, (b) prefix-freeness, (c) Kraft completeness (sum == 1).
# A tiling solver repairs uncertain lengths GIVEN the code values:
# a complete prefix code's intervals [v/2^L, (v+1)/2^L) tile [0,1).
from fractions import Fraction
import sys

# table id -> (dim, bits row-major x*dim+y, codes row-major)
TABLES = {}

def T(tid, dim, bits, codes):
    assert len(bits) == dim * dim and len(codes) == dim * dim, tid
    TABLES[tid] = (dim, bits, codes)

T(1, 2, [1, 3, 2, 3], [1, 1, 1, 0])

T(2, 3,
  [1, 3, 6, 3, 3, 5, 5, 5, 6],
  [1, 2, 1, 3, 1, 1, 3, 2, 0])

T(3, 3,
  [2, 2, 6, 3, 2, 5, 5, 5, 6],
  [3, 2, 1, 1, 1, 1, 3, 2, 0])

T(5, 4,
  [1, 3, 6, 7, 3, 3, 6, 7, 6, 6, 7, 8, 7, 6, 7, 8],
  [1, 2, 6, 5, 3, 1, 4, 4, 7, 5, 7, 1, 6, 1, 1, 0])

T(6, 4,
  [3, 3, 5, 7, 3, 2, 4, 5, 4, 4, 5, 6, 6, 5, 6, 7],
  [7, 3, 5, 1, 6, 2, 3, 2, 5, 4, 4, 1, 3, 3, 2, 0])

T(7, 6,
  [1, 3, 6, 8, 8, 9, 3, 4, 6, 7, 7, 8, 6, 5, 7, 8,
   8, 9, 7, 7, 8, 9, 9, 9, 7, 7, 8, 9, 9, 10, 8, 8,
   9, 10, 10, 10],
  [1, 2, 10, 19, 16, 10, 3, 3, 7, 10, 5, 3, 11, 4, 13, 17,
   8, 4, 12, 11, 18, 15, 11, 2, 7, 6, 9, 14, 3, 1, 6, 4,
   5, 3, 2, 0])

T(8, 6,
  [2, 3, 6, 8, 8, 9, 3, 2, 4, 8, 8, 8, 7, 4, 6, 8,
   8, 9, 8, 8, 8, 9, 9, 10, 9, 8, 8, 9, 10, 10, 10, 10,
   10, 11, 11, 11],
  [3, 4, 6, 18, 12, 5, 5, 1, 2, 16, 9, 3, 7, 3, 5, 14,
   7, 3, 19, 17, 15, 13, 10, 4, 13, 5, 8, 11, 5, 1, 12, 4,
   4, 1, 1, 0])

T(9, 6,
  [3, 3, 5, 6, 8, 9, 3, 3, 4, 5, 6, 8, 4, 4, 5, 6,
   7, 8, 6, 5, 6, 7, 7, 8, 7, 6, 7, 7, 8, 9, 8, 7,
   8, 8, 9, 9],
  [7, 5, 9, 14, 15, 7, 6, 4, 5, 5, 6, 7, 7, 6, 8, 8,
   8, 5, 15, 6, 9, 10, 5, 1, 11, 7, 9, 6, 4, 1, 14, 4,
   6, 2, 6, 0])

T(10, 8,
  [1, 3, 6, 8, 9, 9, 9, 10, 3, 4, 6, 7, 8, 9, 8, 8,
   6, 6, 7, 8, 9, 10, 9, 9, 7, 7, 8, 9, 10, 10, 9, 10,
   8, 8, 9, 10, 10, 10, 10, 10, 9, 9, 10, 10, 11, 11, 10, 11,
   8, 8, 9, 10, 10, 10, 11, 11, 9, 8, 9, 10, 10, 11, 11, 11],
  [1, 2, 10, 23, 35, 30, 12, 17, 3, 3, 8, 12, 18, 21, 12, 7,
   11, 9, 15, 21, 32, 40, 19, 6, 14, 13, 22, 34, 46, 23, 18, 7,
   20, 19, 33, 47, 27, 22, 9, 3, 31, 22, 41, 26, 21, 20, 5, 3,
   14, 13, 10, 11, 16, 6, 5, 1, 9, 8, 7, 8, 4, 4, 2, 0])

T(11, 8,
  [2, 3, 5, 7, 8, 9, 8, 9, 3, 3, 4, 6, 8, 8, 7, 8,
   4, 4, 5, 6, 8, 9, 8, 8, 6, 6, 6, 7, 8, 9, 8, 9,
   7, 7, 8, 9, 9, 10, 8, 9, 8, 7, 9, 9, 10, 10, 9, 10,
   8, 7, 7, 8, 9, 10, 10, 10, 9, 8, 8, 9, 10, 10, 10, 10],
  [3, 4, 10, 24, 34, 33, 21, 15, 5, 3, 4, 10, 32, 17, 11, 10,
   11, 7, 13, 18, 30, 31, 20, 5, 25, 11, 19, 59, 27, 18, 12, 5,
   35, 33, 31, 58, 30, 16, 7, 5, 28, 26, 32, 19, 17, 15, 8, 14,
   14, 12, 9, 13, 14, 9, 4, 1, 11, 4, 6, 6, 6, 3, 2, 0])

# Table 12, round-15 state: the code VALUES below were recalled
# identically in two separate sessions (r14 and r15, 64/64 agreement);
# the r14 LENGTH recall (row0 tail 8,8,8; entries 12/14/46/52 off) failed
# Kraft at 519/512, the r15 length recall below passes the full gate
# exactly (Kraft 1, prefix-free) and SHIPPED (L3IsoHuff). Closure record:
# the exact-tiling solver proves the lengths are NOT uniquely forced by
# the codes — alternates swap lengths between equal-code entries (e.g.
# entries 1/10, both code 6, hlen 3/4) — so the (x,y) attribution of ~7
# entries rests on the gate-passing recollection, the same evidence level
# as tables 1-7/9/10 (single recollection + outright gate pass).
T(12, 8,
  [4, 3, 5, 7, 8, 9, 9, 9, 3, 3, 4, 5, 7, 7, 8, 8,
   5, 4, 5, 6, 7, 8, 7, 8, 6, 5, 6, 6, 7, 8, 8, 8,
   7, 6, 7, 7, 8, 8, 8, 9, 8, 7, 8, 8, 8, 9, 8, 9,
   8, 7, 7, 8, 8, 9, 9, 10, 9, 8, 8, 9, 9, 9, 9, 10],
  [9, 6, 16, 33, 41, 39, 38, 26, 7, 5, 6, 9, 23, 16, 26, 11,
   17, 7, 11, 14, 21, 30, 10, 7, 17, 10, 15, 12, 18, 28, 14, 5,
   32, 13, 22, 19, 18, 16, 9, 5, 40, 17, 31, 29, 17, 13, 4, 2,
   27, 12, 11, 15, 10, 7, 4, 1, 27, 12, 8, 12, 6, 3, 1, 0])

# count1 table A (quad, 16 entries indexed by v*8+w*4+x*2+y)
QUAD_A_BITS = [1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6]
QUAD_A_CODES = [1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1]


def check(name, bits, codes):
    n = len(bits)
    errs = []
    for i, (L, v) in enumerate(zip(bits, codes)):
        if v >= (1 << L):
            errs.append(f"entry {i}: code {v} needs more than {L} bits")
    cw = [(format(v, 'b').rjust(L, '0')) for L, v in zip(bits, codes)]
    seen = {}
    for i, w in enumerate(cw):
        if w in seen:
            errs.append(f"duplicate code {w} at {seen[w]} and {i}")
        seen[w] = i
    for i in range(n):
        for j in range(n):
            if i != j and len(cw[i]) < len(cw[j]) and cw[j].startswith(cw[i]):
                errs.append(f"{cw[i]} (#{i}) prefixes {cw[j]} (#{j})")
    kraft = sum(Fraction(1, 1 << L) for L in bits)
    status = "OK" if not errs and kraft == 1 else "FAIL"
    print(f"{name}: n={n} kraft={kraft} ({float(kraft):.6f}) "
          f"errs={len(errs)} -> {status}")
    for e in errs[:8]:
        print("   ", e)
    return not errs and kraft == 1


def solve(name, dim, codes, priors, radius=2, max_solutions=4):
    """Exact-tiling backtracking: find length assignment L_i with
    |L_i - prior_i| <= radius, v_i < 2^L_i, intervals tile [0,1).
    Returns list of solutions (each a bits list)."""
    n = len(codes)
    sols = []
    used = [False] * n
    assign = [0] * n

    def candidates(pos):
        # entries whose interval could start at pos with some L near prior
        out = []
        for i in range(n):
            if used[i]:
                continue
            v = codes[i]
            for L in range(max(1, priors[i] - radius), priors[i] + radius + 1):
                if v >= (1 << L):
                    continue
                if Fraction(v, 1 << L) == pos:
                    out.append((i, L))
        # prefer lengths closest to prior
        out.sort(key=lambda t: abs(t[1] - priors[t[0]]))
        return out

    def bt(pos, count):
        if len(sols) >= max_solutions:
            return
        if pos == 1:
            if count == n:
                sols.append(list(assign))
            return
        if count == n:
            return
        for i, L in candidates(pos):
            used[i] = True
            assign[i] = L
            bt(pos + Fraction(1, 1 << L), count + 1)
            used[i] = False
        return

    bt(Fraction(0), 0)
    print(f"solve {name}: {len(sols)} solution(s) within radius {radius}")
    for s in sols[:2]:
        diffs = [(i, priors[i], s[i]) for i in range(n) if s[i] != priors[i]]
        print(f"   diffs vs prior ({len(diffs)}): {diffs[:20]}")
    return sols


if __name__ == "__main__":
    for tid in sorted(TABLES):
        dim, bits, codes = TABLES[tid]
        check(f"table {tid}", bits, codes)
    check("count1 A", QUAD_A_BITS, QUAD_A_CODES)
    # Round-15 table-11 record: a fresh recollection of the code values
    # disagreed with the r14 recall on 62/64 entries and was itself
    # structurally invalid (codes exceeding their lengths) — neither
    # passes the gate and no ≤3-entry repair exists, so table 11 stays
    # declared. Tables 13/15/16/24 (256 entries): the blocker is the CODE
    # arrays — the tiling solver finds MULTIPLE length assignments even
    # for 64-entry table 12, so Kraft-valid lengths alone cannot ship a
    # table, and 256-entry code recall is beyond reliability.
