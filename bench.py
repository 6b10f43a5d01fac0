"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Flagship benchmark (BASELINE.json north star): end2end text MoRec training —
BERT-small item encoder (4 layers, hidden 512) + SASRec user tower +
in-batch debiased CE at the reference's MIND config (batch 128/chip,
max_seq_len 20, embedding_dim 512, title length 30, dropout 0.1 — reference
inbatch_sasrec_e2e_text/train_bert_base.py:22-28). Item ids are
Zipf(1.2)-distributed (real recsys catalogs are heavy-tailed; MIND is) and
unique-item dedup is ON (--dedup_items): the framework encodes each unique
item once per batch instead of per occurrence like the reference. Weights
are random (no egress for pretrained checkpoints) — throughput is
geometry-dependent only.

Honest end-to-end timing: the timed loop streams DISTINCT host batches
through the same host path the Trainer uses per step — dedup packing
(np.unique) + H2D — overlapped one step ahead on a worker thread
(data/vision_loader.py Prefetcher), exactly like Trainer.train. The JSON
also reports device_only_sps (re-feeding one resident batch) so host-pipeline
overhead is visible: the two should be within ~10%.

vs_baseline: the reference publishes NO throughput numbers (BASELINE.md);
the baseline constant is the BASELINE.json target = 3x an estimated A100
torch AMP rate for the reference implementation at this config
(~550 samples/s/GPU: each step pushes batch*(L+1)=2688 title sequences
through the encoder, ~6 TFLOP/step fwd+bwd at fp16 with typical A100
utilization).

BENCH_CONFIG=text_morec_uniform: uniform ids, no dedup (per-occurrence
encoding like the reference). BENCH_CONFIG=idrec: the IDRec secondary.
BENCH_CONFIG=vision_morec: Swin-tiny 224 + SASRec at the reference's HM
end2end config (batch 64/chip, max_seq_len 10, embedding_dim 2048 —
inbatch_sasrec_e2e_vision/train_swin_tiny.py:11-26); uint8 images are
streamed per step (device-side normalize), encoder microbatched via
--encoder_chunk to fit 16 GB HBM. Baseline: ~800 img/s Swin-tiny AMP
training on A100 (typical published rate) / 11 images per sample = ~73
samples/s/GPU, x3. BENCH_CONFIG=vision_morec_zipf applies the text
headline's methodology to vision: Zipf(1.2) ids + --dedup_items, so each
batch fetches and encodes only its ~270 unique images instead of all 704
slots (retail catalogs are as heavy-tailed as news).
"""

import json
import os
import time

import numpy as np

BASELINE_SPS = {
    "text_morec": 3 * 550.0,          # 3x estimated A100 (see above)
    "text_morec_uniform": 3 * 550.0,
    "idrec": 75_000.0,                # 3x estimated A100 for the ID model
    "vision_morec": 3 * 73.0,         # 3x estimated A100 Swin-tiny rate
    "vision_morec_zipf": 3 * 73.0,    # same target, Zipf ids + dedup
}

# Measured single-chip rooflines at exact reference semantics (BASELINE.md
# "Amended per-config throughput targets" — the arithmetic lives there).
# vs_baseline stays computed against the original constants for continuity;
# vs_ceiling reports attainment of the measured hardware bound.
CEILING_SPS = {
    "text_morec_uniform": 1560.0,   # elementwise HBM floor (r3 amendment:
                                    # embedding backward restructured,
                                    # BASELINE.md arithmetic)
    "idrec": 40_000.0,              # dense-AdamW table pass + quadratic CE
    "vision_morec": 95.0,           # dh=32 MXU K-fill + window tile padding
}

# geometry per config: (item_num, batch/chip, max_seq_len, embedding_dim)
GEOM = {
    "text_morec": (100_000, 128, 20, 512),
    "text_morec_uniform": (100_000, 128, 20, 512),
    # B=256: the FIRST entry of the reference IDRec grid's batch_size_list
    # (inbatch_sasrec_e2e_text/train_id.py:24, [256, 128]); at B=128 the
    # tunneled platform's ~2.9 ms dispatch floor is 57% of the step
    # (tools/idrec_bound.py measurement, PARITY.md)
    "idrec": (100_000, 256, 20, 512),
    "vision_morec": (100_000, 64, 10, 2048),
    # Zipf ids + --dedup_items: the text headline's methodology applied to
    # vision (HM purchase catalogs are heavy-tailed like MIND's); each
    # unique image is fetched + encoded once per batch (~270 of 704 slots)
    "vision_morec_zipf": (100_000, 64, 10, 2048),
}
ITEM_NUM, B, L, D = GEOM[os.environ.get("BENCH_CONFIG", "text_morec")]
S = L + 1
RESIZE = 224


def _gen_raw(config: str, seed: int, GB: int):
    """One host batch exactly as the TrainBatcher would emit it."""
    rng = np.random.default_rng(seed)
    if config in ("text_morec", "vision_morec_zipf"):
        # heavy-tailed catalog popularity (real recsys distribution)
        ids = np.minimum(rng.zipf(1.2, size=(GB, S)), ITEM_NUM).astype(np.int32)
    else:
        ids = rng.integers(1, ITEM_NUM + 1, size=(GB, S)).astype(np.int32)
    lm = (rng.uniform(size=(GB, L)) < 0.9).astype(np.float32)
    lm[:, -1] = 1.0
    if config == "vision_morec":
        # the images the VisionBatchPipe would emit (uint8 NHWC; id 0 = zeros)
        imgs = rng.integers(0, 256, size=(GB * S, RESIZE, RESIZE, 3),
                            dtype=np.uint8)
        return ids, lm, imgs
    return ids, lm


def _build(config: str):
    import jax
    import jax.numpy as jnp
    from idvs.morec_tpu.config import Config
    from idvs.morec_tpu.models.model import make_model
    from idvs.morec_tpu.train.state import (TrainState, default_encoder_predicate,
                                            make_optimizer, param_labels)
    from idvs.morec_tpu.train.step import make_train_step
    from idvs.morec_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    mesh = make_mesh(jax.devices())
    n_chips = int(mesh.devices.size)
    GB = B * n_chips
    # idrec: 8 train steps per dispatch (unrolled lax.scan inside ONE jit,
    # identical update semantics — tests/test_multistep_dispatch.py) to
    # amortize the per-launch dispatch cost that dominates tiny steps
    # (PARITY.md IDRec bound). 1-chip only here: shard_batch shards axis 0
    # and the stacked batches carry steps on axis 0.
    n_steps = 8 if config == "idrec" and n_chips == 1 else 1
    n_raw = 4 if config == "vision_morec" else 10   # 106 MB of images each
    raws = [_gen_raw(config, seed, GB * n_steps) for seed in range(n_raw)]

    vision = config.startswith("vision_morec")
    encoder = None
    item_content = None
    pool = None
    if vision:
        from idvs.morec_tpu.models.swin import SwinConfig, SwinModel
        from idvs.morec_tpu.models.vision_tower import VisionTower
        scfg = SwinConfig()   # swin-tiny
        encoder = VisionTower(net=SwinModel(scfg), kind="swin",
                              embedding_dim=D, feature_dim=scfg.num_features,
                              compute_dtype=jnp.bfloat16)
    if config == "vision_morec_zipf":
        # image pool the per-step unique gather copies from (stands in for
        # the MKV store fetch; the device metric is unaffected either way)
        pool = np.random.default_rng(7).integers(
            0, 256, size=(1024, RESIZE, RESIZE, 3), dtype=np.uint8)
    if config.startswith("text_morec"):
        from idvs.morec_tpu.models.bert import BertConfig, BertModel
        from idvs.morec_tpu.models.text_tower import TextTower
        # BERT-small geometry (reference run.py:61-63: word dim 512)
        bcfg = BertConfig(vocab_size=30522, hidden_size=512,
                          num_hidden_layers=4, num_attention_heads=8,
                          intermediate_size=2048, max_position_embeddings=512)
        encoder = TextTower(net=BertModel(bcfg), embedding_dim=D,
                            word_embedding_dim=512, pooling="cls",
                            attr_lengths=(30,))
        rng = np.random.default_rng(0)
        tokens = rng.integers(1, 30000, size=(ITEM_NUM + 1, 30)).astype(np.int32)
        attmask = np.ones_like(tokens)
        item_content = jnp.asarray(np.concatenate([tokens, attmask], axis=1))

    dedup = config in ("text_morec", "vision_morec_zipf") and n_chips == 1
    cap = 0
    if dedup:
        # static dedup capacity: covers every streamed batch (round up to the
        # lane multiple — 96 for vision so the encoder chunking divides it)
        max_uniq = max(len(np.unique(r[0])) for r in raws)
        q = 96 if vision else 256
        cap = (max_uniq + q - 1) // q * q
    cfg = Config(item_tower="modal" if encoder else "id",
                 modality="vision" if vision else "text",
                 loss="inbatch_ce", max_seq_len=L,
                 embedding_dim=D, batch_size=B, num_attention_heads=2,
                 transformer_block=2, lr=1e-4,
                 fine_tune_lr=1e-4 if vision else 5e-5,
                 num_words_title=30, dedup_items=dedup, dedup_cap=cap,
                 # microbatch the Swin encoder: B*S=704 images' activations
                 # exceed 16 GB HBM. 8 remat'd chunks of 88: measured
                 # per-image throughput RISES as chunks shrink (1038 img/s
                 # at 88 vs 893 at 176 — XLA spends less on memory-pressure
                 # copies; tools/swin_profile.py), and k=8 stays within the
                 # unrolled-chunk regime (train/step.py)
                 encoder_chunk=int(os.environ.get(
                     "BENCH_ENCODER_CHUNK",
                     (cap // 3 if dedup else (B * S) // 8) if vision else 0)),
                 encoder_chunk_unroll=int(os.environ.get(
                     "BENCH_CHUNK_UNROLL", 8)))
    model = make_model(cfg, item_num=ITEM_NUM, encoder=encoder)

    ids0 = jnp.asarray(raws[0][0])
    lm0 = jnp.asarray(raws[0][1])
    if vision:
        src = pool if pool is not None else raws[0][2]
        init_content = jnp.asarray(src[:2 * S])
    else:
        init_content = (None if item_content is None
                        else item_content[ids0[:2].reshape(-1)])
    params = model.init(jax.random.PRNGKey(0), ids0[:2], init_content, lm0[:2])
    pop = np.full(ITEM_NUM + 1, 1.0 / ITEM_NUM); pop[0] = 1.0
    log_pop = jnp.asarray(np.log(pop), jnp.float32)

    labels = None
    if encoder is not None:
        labels = param_labels(params["params"], default_encoder_predicate, set())
    tx = make_optimizer(cfg, labels)
    params = replicate(mesh, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params["params"]),
                       dropout_rng=jax.random.PRNGKey(1))
    step = make_train_step(model, cfg, tx, mesh, item_content=item_content,
                           log_pop=log_pop, n_steps=n_steps)

    def pack(raw):
        """Host work per step, identical to Trainer.make_batch: dedup
        unique-packing (np.unique) + ONE H2D of ids/mask/images
        (+uniq/inverse). numpy goes straight to the sharded device_put —
        a jnp.asarray first would place on the default device and the
        re-shard round-trips device->host->device through the tunnel
        (measured 2.7 s for the 106 MB image batch vs 107 ms direct)."""
        import jax.numpy as jnp
        ids, lm = raw[0], raw[1]
        batch = {}
        if dedup:
            flat = ids.reshape(-1)
            uniq, inv = np.unique(flat, return_inverse=True)
            if len(uniq) <= cap:   # documented fallback: full encode if over
                up = np.zeros(cap, np.int32)
                up[:len(uniq)] = uniq
                batch["uniq_ids"] = jnp.asarray(up)
                batch["inverse"] = jnp.asarray(inv.astype(np.int32))
                if pool is not None:   # vision: unique images only
                    batch["uniq_content"] = jnp.asarray(pool[up % len(pool)])
        dev = {"ids": ids, "log_mask": lm}
        if n_steps > 1:   # leading steps-per-dispatch axis
            dev = {k: v.reshape((n_steps, GB) + v.shape[1:])
                   for k, v in dev.items()}
        if len(raw) > 2:   # vision: uint8 images for every item slot
            dev["content"] = raw[2]
        sharded = shard_batch(mesh, dev)
        return sharded | batch

    return step, state, pack, raws, GB * n_steps, n_chips


def main():
    import jax
    from idvs.morec_tpu.data.vision_loader import Prefetcher
    # Persistent compilation cache: the BERT-small step takes ~6 min to
    # compile through the tunneled platform; cache it across runs.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    config = os.environ.get("BENCH_CONFIG", "text_morec")
    step, state, pack, raws, GB, n_chips = _build(config)

    def read(loss):
        """D2H value read closing a timed loop (scalar or (n_steps,))."""
        return float(np.asarray(loss).sum())

    # warmup (donation triggers a second compile; tunneled platform autotunes)
    batch0 = pack(raws[0])
    for _ in range(5):
        state, loss = step(state, batch0)
    read(loss)

    # timed-loop lengths: text steps are now ~25-75 ms, so a 20-iter window
    # is only ~0.5-1.5 s and single tunnel hiccups (~15 ms) read as ±3%
    # (a 10-iter headline run once read e2e 10% ABOVE device-only — pure
    # scheduling noise); 40 iters doubles the window for ~1 s extra wall
    # time. Vision steps are ~1.4 s so short loops are already stable.
    iters = {"text_morec": 40, "text_morec_uniform": 40,
             "vision_morec": 6, "vision_morec_zipf": 8}.get(config, 30)

    # device-only: re-feed one resident batch. End with a D2H read of the
    # final loss, NOT block_until_ready: on this tunneled platform
    # block_until_ready can return before the chained computation finishes
    # (observed: a 915 ms/step program "timed" at 13 ms/step), while a
    # value read cannot.
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, batch0)
    read(loss)
    dev_dt = time.perf_counter() - t0

    # end-to-end: stream distinct host batches through pack() one step ahead
    # (the Trainer's Prefetcher), including per-step np.unique + H2D
    stream = [raws[i % len(raws)] for i in range(iters)]
    t0 = time.perf_counter()
    for batch in Prefetcher(iter(stream), pack):
        state, loss = step(state, batch)
    read(loss)
    e2e_dt = time.perf_counter() - t0

    sps = (GB * iters / e2e_dt) / n_chips
    dev_sps = (GB * iters / dev_dt) / n_chips
    name = {
        "text_morec": "text_morec_bert_small_zipf_train_samples_per_sec_per_chip",
        "text_morec_uniform": "text_morec_bert_small_train_samples_per_sec_per_chip",
        "idrec": "idrec_inbatch_ce_train_samples_per_sec_per_chip",
        "vision_morec": "vision_morec_swin_tiny_train_samples_per_sec_per_chip",
        "vision_morec_zipf":
            "vision_morec_swin_tiny_zipf_train_samples_per_sec_per_chip",
    }[config]
    out = {
        "metric": name,
        "value": round(sps, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / BASELINE_SPS[config], 3),
        "device_only_sps": round(dev_sps, 1),
    }
    if config.startswith("vision_morec"):
        # This tunneled 1-chip environment's H2D path degrades ~40x (to
        # ~25 MB/s) permanently after ANY sizable program executes —
        # measured process-wide, survives freeing every buffer and idling
        # (PARITY.md "H2D poisoning"). The 106 MB/step image batch then
        # dominates streaming (~4 s/step vs 90 ms pre-poisoning / <10 ms
        # on a real v5e host NIC). Report device throughput as the value;
        # streaming-through-the-tunnel is kept for transparency.
        out["metric"] = name + "_device"
        out["value"] = round(dev_sps, 1)
        out["vs_baseline"] = round(dev_sps / BASELINE_SPS[config], 3)
        out["tunnel_stream_sps"] = round(sps, 1)
        out["h2d_artifact"] = "tunnel H2D 25MB/s post-execution; see PARITY.md"
    if config in CEILING_SPS:
        out["vs_ceiling"] = round(out["value"] / CEILING_SPS[config], 3)
    print(json.dumps(out))


def main_all():
    """Run EVERY bench config, one JSON line each (VERDICT r4 item 7: all
    five numbers the docs quote, driver-reproducible in one invocation).

    Each config runs in its own subprocess: the geometry globals are
    selected per-process by BENCH_CONFIG, and process isolation keeps the
    tunneled platform's post-execution H2D degradation (PARITY.md) of one
    config from contaminating the next. Optional BENCH_ALL_OUT=<path>
    additionally writes the lines to a file."""
    import subprocess
    import sys

    path = os.environ.get("BENCH_ALL_OUT")
    if path and os.path.exists(path):
        os.remove(path)
    # per-config wall clamp: this platform can hang a worker during remote
    # compiles (CLAUDE.md platform quirks) — one stuck config must not
    # stall the sweep or lose the lines already collected, so each line is
    # appended to BENCH_ALL_OUT as it lands
    per_config_timeout = int(os.environ.get("BENCH_ALL_TIMEOUT", "2700"))
    for config in ("text_morec", "text_morec_uniform", "idrec",
                   "vision_morec", "vision_morec_zipf"):
        env = dict(os.environ)
        env["BENCH_CONFIG"] = config
        env.pop("BENCH_ALL", None)
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True,
                               timeout=per_config_timeout)
            out_lines = [ln for ln in r.stdout.strip().splitlines()
                         if ln.startswith("{")]
            if r.returncode != 0 or not out_lines:
                line = json.dumps({"metric": config, "error":
                                   (r.stderr or "no output").strip()[-400:]})
            else:
                line = out_lines[-1]
        except subprocess.TimeoutExpired:
            line = json.dumps({"metric": config,
                               "error": f"timeout after "
                                        f"{per_config_timeout}s"})
        print(line, flush=True)
        if path:
            with open(path, "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    import sys
    if "--all" in sys.argv or os.environ.get("BENCH_ALL"):
        main_all()
    else:
        main()
