"""Eval-side catalog-encode throughput (the dominant full-catalog eval
cost: every item through the frozen/current encoder, reference
inbatch_sasrec_e2e_text/data_utils/metrics.py:60-74).

Measures train/evaluate.py:compute_item_embeddings — the REAL eval path,
which takes no gradients, so the fused tails run their forward-only primal
kernels (no VJP-residual HBM writes) — at the bench's flagship geometry
(BERT-small item tower, 30-token titles, 100k-item catalog).

Run (real TPU):  python tools/eval_encode_bench.py [item_num]
Prints items/s for the full catalog pass, drain-closed.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from idvs.morec_tpu.config import Config
    from idvs.morec_tpu.models.bert import BertConfig, BertModel
    from idvs.morec_tpu.models.model import make_model
    from idvs.morec_tpu.models.text_tower import TextTower
    from idvs.morec_tpu.train.evaluate import compute_item_embeddings
    from idvs.morec_tpu.parallel.mesh import make_mesh
    from tools._timing import drain

    item_num = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    D = 512
    bcfg = BertConfig(vocab_size=30522, hidden_size=512,
                      num_hidden_layers=4, num_attention_heads=8,
                      intermediate_size=2048, max_position_embeddings=512)
    encoder = TextTower(net=BertModel(bcfg), embedding_dim=D,
                        word_embedding_dim=512, pooling="cls",
                        attr_lengths=(30,))
    cfg = Config(item_tower="modal", modality="text", max_seq_len=20,
                 embedding_dim=D, batch_size=128, num_attention_heads=2,
                 transformer_block=2)
    model = make_model(cfg, item_num=item_num, encoder=encoder)

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 30000, size=(item_num + 1, 30)).astype(np.int32)
    content = jnp.asarray(
        np.concatenate([tokens, np.ones_like(tokens)], axis=1))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.arange(2, dtype=jnp.int32), content[:2], True,
                        method="item_embs")
    mesh = make_mesh(jax.devices())

    def run():
        return compute_item_embeddings(model, params, item_num, content, D,
                                       batch_size=512, mesh=mesh)

    table = run()                       # compile + warm
    drain(jnp.asarray(table))
    t0 = time.perf_counter()
    table = run()
    drain(jnp.asarray(table))
    dt = time.perf_counter() - t0
    print(f"catalog encode: {item_num + 1} items in {dt:.2f}s = "
          f"{(item_num + 1) / dt:,.0f} items/s "
          f"(BERT-small, 30-token titles, eval fwd-only path)")


if __name__ == "__main__":
    main()
