"""Retrieval-serving latency/QPS on the real TPU.

Builds a trained-shape IDRec retriever (reference train_id.py geometry:
2-block SASRec d=512, 100k-item catalog) and times `recommend` end to end
— host pad -> H2D -> user tower -> (B, 100k+1) score matmul -> top-K ->
D2H of the K ids. The D2H result read IS the serving pattern, so the
tunnel's honest-timing rules are satisfied by construction.

Usage: python tools/serve_bench.py [B ...]   (default 1 8 64 256)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITEMS = int(os.environ.get("SERVE_ITEMS", 100_000))
L, D = 20, 512


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from idvs.morec_tpu.config import Config
    from idvs.morec_tpu.models.model import make_model
    from idvs.morec_tpu.serve import Retriever

    batches = [int(b) for b in sys.argv[1:]] or [1, 8, 64, 256]

    # tunnel RTT floor: a trivial dispatch + 4-byte D2H read — on this
    # tunneled platform it dominates small-batch p50 (a co-located host
    # serves the same program in single-digit ms)
    one = jnp.ones(())
    tiny = jax.jit(lambda x: x + 1.0)
    float(tiny(one))
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        float(tiny(one))
        lat.append((time.perf_counter() - t0) * 1e3)
    lat.sort()
    print(f"tunnel RTT floor (null dispatch + D2H): p50 "
          f"{lat[len(lat) // 2]:.2f} ms", flush=True)
    cfg = Config(item_tower="id", loss="inbatch_ce", max_seq_len=L,
                 embedding_dim=D, batch_size=64, num_attention_heads=2,
                 transformer_block=2)
    model = make_model(cfg, item_num=ITEMS, encoder=None)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, L + 1), jnp.int32), None,
                        jnp.zeros((2, L), jnp.float32))
    t0 = time.perf_counter()
    table = Retriever.encode_catalog(model, params, ITEMS, None, D,
                                     batch_size=4096)
    table.block_until_ready()
    print(f"catalog encode ({ITEMS + 1} items): "
          f"{time.perf_counter() - t0:.2f} s", flush=True)

    r = Retriever(model, params, table, max_seq_len=L,
                  batch_sizes=tuple(batches))
    rng = np.random.default_rng(0)
    for B in batches:
        hists = [rng.integers(1, ITEMS + 1,
                              size=rng.integers(3, L + 1)).tolist()
                 for _ in range(B)]
        for _ in range(3):                                   # warmup+compile
            r.recommend(hists, top_k=10)
        lat = []
        for _ in range(30):
            t0 = time.perf_counter()
            ids, _ = r.recommend(hists, top_k=10)
            lat.append((time.perf_counter() - t0) * 1e3)
        lat.sort()
        p50, p95 = lat[len(lat) // 2], lat[int(len(lat) * 0.95)]
        print(f"B={B:>4}: p50 {p50:7.2f} ms  p95 {p95:7.2f} ms  "
              f"{B / (p50 / 1e3):9.0f} users/s", flush=True)


if __name__ == "__main__":
    main()
