#!/usr/bin/env python3
# Near-perfect-reconstruction validation of the recalled ISO 11172-3
# Table C.1 synthesis window (stored as the 257 half-window integers,
# value = int/65536; full 512 window by the published mirror symmetry
# D[512-i] = -D[i] except at multiples of 64 where it is +D[i]).
import math

ENW = [
     0,    -1,    -1,    -1,    -1,    -1,    -1,    -2,
    -2,    -2,    -2,    -3,    -3,    -4,    -4,    -5,
    -5,    -6,    -7,    -7,    -8,    -9,   -10,   -11,
   -13,   -14,   -16,   -17,   -19,   -21,   -24,   -26,
   -29,   -31,   -35,   -38,   -41,   -45,   -49,   -53,
   -58,   -63,   -68,   -73,   -79,   -85,   -91,   -97,
  -104,  -111,  -117,  -125,  -132,  -139,  -147,  -154,
  -161,  -169,  -176,  -183,  -190,  -196,  -202,  -208,
  -213,  -218,  -222,  -225,  -227,  -228,  -228,  -227,
  -224,  -221,  -215,  -208,  -200,  -189,  -177,  -163,
  -146,  -127,  -106,   -83,   -57,   -29,     2,    36,
    72,   111,   153,   197,   244,   294,   347,   401,
   459,   519,   581,   645,   711,   779,   848,   919,
   991,  1064,  1137,  1210,  1283,  1356,  1428,  1498,
  1567,  1634,  1698,  1759,  1817,  1870,  1919,  1962,
  2001,  2032,  2057,  2075,  2085,  2087,  2080,  2063,
  2037,  2000,  1952,  1893,  1822,  1739,  1644,  1535,
  1414,  1280,  1131,   970,   794,   605,   402,   185,
   -45,  -288,  -545,  -814, -1095, -1388, -1692, -2006,
 -2330, -2663, -3004, -3351, -3705, -4063, -4425, -4788,
 -5153, -5517, -5879, -6237, -6589, -6935, -7271, -7597,
 -7910, -8209, -8491, -8755, -8998, -9219, -9416, -9585,
 -9727, -9838, -9916, -9959, -9966, -9935, -9863, -9750,
 -9592, -9389, -9139, -8840, -8492, -8092, -7640, -7134,
 -6574, -5959, -5288, -4561, -3776, -2935, -2037, -1082,
   -70,   998,  2122,  3300,  4533,  5818,  7154,  8540,
  9975, 11455, 12980, 14548, 16155, 17799, 19478, 21189,
 22929, 24694, 26482, 28289, 30112, 31947, 33791, 35640,
 37489, 39336, 41176, 43006, 44821, 46617, 48390, 50137,
 51853, 53534, 55178, 56778, 58333, 59838, 61289, 62684,
 64019, 65290, 66494, 67629, 68692, 69679, 70590, 71420,
 72169, 72835, 73415, 73908, 74313, 74630, 74856, 74992,
 75038,
]

def build_window():
    assert len(ENW) == 257, len(ENW)
    D = [0.0] * 512
    for i in range(257):
        D[i] = ENW[i] / 65536.0
    for i in range(1, 256):
        v = ENW[i] / 65536.0
        D[512 - i] = -v if (i & 63) != 0 else v
    return D

def cascade_snr(D):
    C = [d / 32.0 for d in D]
    n = 4096
    x = [math.sin(2 * math.pi * 0.03 * t) + 0.5 * math.sin(2 * math.pi * 0.11 * t + 1.0)
         for t in range(n)]
    X = [0.0] * 512
    V = [0.0] * 1024
    out = []
    Ma = [[math.cos((2 * k + 1) * (i - 16) * math.pi / 64.0) for i in range(64)]
          for k in range(32)]
    Ns = [[math.cos((16 + k) * (2 * i + 1) * math.pi / 64.0) for i in range(32)]
          for k in range(64)]
    for blk in range(n // 32):
        seg = x[blk * 32:(blk + 1) * 32]
        X = seg[::-1] + X[:480]
        Z = [X[i] * C[i] for i in range(512)]
        Y = [sum(Z[i + 64 * j] for j in range(8)) for i in range(64)]
        S = [sum(Ma[k][i] * Y[i] for i in range(64)) for k in range(32)]
        V = [sum(Ns[k][i] * S[i] for i in range(32)) for k in range(64)] + V[:960]
        for j in range(32):
            acc = 0.0
            for b in range(16):
                u = V[(b // 2) * 128 + j] if b % 2 == 0 else V[(b // 2) * 128 + 96 + j]
                acc += u * D[b * 32 + j]
            out.append(acc)
    # find best integer delay in a plausible range
    best = None
    for d in range(400, 600):
        num = sum((out[t] - x[t - d]) ** 2 for t in range(1000, 3000))
        den = sum(x[t - d] ** 2 for t in range(1000, 3000))
        r = num / den
        if best is None or r < best[1]:
            best = (d, r)
    return best

if __name__ == "__main__":
    D = build_window()
    d, r = cascade_snr(D)
    print(f"best delay {d}, rel err {r:.3e}, SNR {-10*math.log10(r):.1f} dB")
