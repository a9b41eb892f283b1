"""How does TPU gather cost scale — with row COUNT or row BYTES?

The train-path grouping gathers [B, S, 224] neighbor rows of 8 channels from
[B, N, 8] (model/layers.py gather mode). Whether to attack it with fewer/wider
rows (fold conv0 into the source before gathering) or a Pallas one-hot
contraction depends on the scaling law of XLA's TPU gather. This sweeps
row count R and channel width C at fixed B, N with honest key-perturbed
on-device timing (utils.profiling.device_throughput; naive const-input scans
read fake ~5 ms — the documented hoist trap).

Run on the REAL TPU with an otherwise-idle host:
    python scripts/gather_scaling.py
"""

import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ev2hands_tpu.ops.pointnet import index_points
    from ev2hands_tpu.utils.profiling import device_throughput

    B, N = 8, 2048
    rng = np.random.RandomState(0)
    results = []
    for R, C in [
        (114688, 8),    # production: S*K = 512*224 rows of 8ch
        (114688, 32),
        (114688, 64),
        (114688, 128),
        (57344, 8),     # half the rows
        (57344, 128),
        (28672, 8),     # quarter
        (28672, 128),   # 1/4 rows x 16x bytes == same bytes as (114688, 32)
    ]:
        src0 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        idx0 = jnp.asarray(rng.randint(0, N, size=(B, R)).astype(np.int32))

        def run(k, src0=src0, idx0=idx0):
            # key-dependent: perturb source values and shift indices so the
            # gather cannot be hoisted out of the timing scan
            shift = jax.random.randint(k, (), 0, N)
            idx = (idx0 + shift) % N
            src = src0 + jax.random.normal(k, (1, 1, src0.shape[-1]))
            return index_points(src, idx)

        sec = device_throughput(run, iters=20)
        row = {"R": R, "C": C, "ms": round(sec * 1e3, 3),
               "GB_out": round(B * R * C * 4 / 1e9, 3)}
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
