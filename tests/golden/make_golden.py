"""Generate the golden binary fixtures byte-by-byte with struct.pack —
deliberately independent of chamjax.data.datasets, so the loader tests
read files the loaders' own writers never touched.

Layouts follow the published formats as the reference documents them
(Faiss_experiments/datasets.py):
- TexMex .fvecs/.ivecs/.bvecs: per row [int32 d][d elements]
- TexMex ground truth: rows of 1001 ints = [1000][1000 neighbor ids]
  (datasets.py:14-22)
- big-ANN .fbin/.ibin: [int32 n][int32 d][row-major payload]
- SPACEV .bin: [int32 n][int32 d][int8 payload]
- SBERT/GNN raw: headerless row-major float32

Run from repo root:  python tests/golden/make_golden.py
"""

import os
import struct

HERE = os.path.dirname(os.path.abspath(__file__))


def w(name, payload: bytes):
    with open(os.path.join(HERE, name), "wb") as f:
        f.write(payload)
    print(name, len(payload), "bytes")


# .fvecs — 3 vectors, d=4
buf = b""
for row in ([1.5, -2.0, 0.25, 3.0],
            [0.0, 1.0, 2.0, 3.0],
            [-1.0, -0.5, 0.5, 1.0]):
    buf += struct.pack("<i", 4) + struct.pack("<4f", *row)
w("golden.fvecs", buf)

# .ivecs — 2 rows, d=3
buf = b""
for row in ([7, 8, 9], [100, 200, 300]):
    buf += struct.pack("<i", 3) + struct.pack("<3i", *row)
w("golden.ivecs", buf)

# .bvecs — 2 vectors, d=6
buf = b""
for row in ([0, 1, 2, 253, 254, 255], [10, 20, 30, 40, 50, 60]):
    buf += struct.pack("<i", 6) + struct.pack("<6B", *row)
w("golden.bvecs", buf)

# ground truth .ivecs — 3 query rows, 1001 ints each: [1000][ids...]
# ids chosen as qi*1_000_000 + j so every position is distinguishable
buf = b""
for qi in range(3):
    buf += struct.pack("<i", 1000)
    buf += struct.pack("<1000i", *[qi * 1_000_000 + j for j in range(1000)])
w("golden_gt1000.ivecs", buf)

# .fbin — n=2, d=3
buf = struct.pack("<ii", 2, 3) + struct.pack("<6f", 1, 2, 3, 4, 5, 6)
w("golden.fbin", buf)

# .ibin — n=3, d=2
buf = struct.pack("<ii", 3, 2) + struct.pack("<6i", 10, 11, 20, 21, 30, 31)
w("golden.ibin", buf)

# SPACEV int8 .bin — n=4, d=5
vals = [v - 64 for v in range(20)]
buf = struct.pack("<ii", 4, 5) + struct.pack("<20b", *vals)
w("golden_spacev.bin", buf)

# SBERT-style headerless f32 — 2 rows at d=384
buf = struct.pack("<768f", *[i / 7.0 for i in range(768)])
w("golden_sbert_d384.f32", buf)
