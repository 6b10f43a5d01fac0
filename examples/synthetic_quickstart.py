"""Self-contained quickstart: generates a synthetic dataset with group
structure, trains IDRec (SASRec + in-batch debiased CE), evaluates, and
test-mode-reloads the best checkpoint — no external data needed.

    python examples/synthetic_quickstart.py [workdir]

On a machine without TPU access, force CPU first:
    import jax; jax.config.update("jax_platforms", "cpu")
"""

import os
import sys

import numpy as np


def make_dataset(base: str, n_users=400, n_items=100, n_groups=10, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, "news.tsv"), "w") as f:
        for k in range(1, n_items + 1):
            f.write(f"i{k}\ttitle of item {k}\tabstract {k}\n")
    groups = [list(range(1 + g * n_items // n_groups,
                         1 + (g + 1) * n_items // n_groups))
              for g in range(n_groups)]
    with open(os.path.join(base, "behaviors.tsv"), "w") as f:
        for u in range(n_users):
            g = groups[u % n_groups]
            L = int(rng.integers(6, 11))
            items = rng.choice(g, size=min(L, len(g)), replace=False)
            f.write(f"u{u}\t" + " ".join(f"i{k}" for k in items) + "\n")


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "./quickstart_data"
    make_dataset(os.path.join(workdir, "SYNTH"))
    os.chdir(workdir)

    from idvs.morec_tpu.run import main as run_main
    best, best_epoch = run_main([
        "--root_data_dir", "./", "--dataset", "SYNTH",
        "--news", "news.tsv", "--behaviors", "behaviors.tsv",
        "--item_tower", "id", "--max_seq_len", "10", "--min_seq_len", "3",
        "--batch_size", "32", "--embedding_dim", "64",
        "--transformer_block", "2", "--epoch", "5", "--lr", "1e-3",
        "--eval_batch_size", "128", "--mode", "train"])
    print(f"\nbest valid HR@10 = {best * 100:.2f} at epoch {best_epoch}")

    hit, ndcg = run_main([
        "--root_data_dir", "./", "--dataset", "SYNTH",
        "--news", "news.tsv", "--behaviors", "behaviors.tsv",
        "--item_tower", "id", "--max_seq_len", "10", "--min_seq_len", "3",
        "--batch_size", "32", "--embedding_dim", "64",
        "--transformer_block", "2", "--epoch", "1", "--lr", "1e-3",
        "--eval_batch_size", "128", "--mode", "test",
        "--load_ckpt_name", f"epoch-{best_epoch}.ckpt"])
    print(f"test HR@10 = {hit * 100:.2f}, nDCG@10 = {ndcg * 100:.2f}")


if __name__ == "__main__":
    main()
