"""RecModel — the composed two-tower model covering all 12 reference variants
through config axes instead of copied directories.

Reference composition points:
- in-batch CE Model (inbatch_sasrec_e2e_text/model/model.py:7-29)
- BCE SASRec Model (bce_text/main-end2end/model/model.py:7-28)
- DSSM Model       (bce_text/main-end2end(DSSM)/model/model.py:7-30)
- ID+MO fusion     (bce_text/id_plus_mo-end2end/model/encoders.py:8-39)
- two-stage cached-embedding tower (bce_text/main-2stage(SASRec)/model/encoders.py:7-31)

The loss itself is NOT in the module (unlike the reference's loss-in-forward
design): towers produce embeddings; pure loss functions in ops/losses.py
consume them. This keeps every method jit/pjit-friendly and lets train and
eval share the exact same tower code.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .dssm import MLPEncoder
from .layers import (AddFusion, CatFusion, FCLayers, MLPLayers, xavier_normal,
                     zeros_init)
from .sasrec import SASRecEncoder


def padded_xavier_normal(key, shape, dtype=jnp.float32):
    """Xavier-normal embedding init with row 0 zeroed (torch padding_idx=0
    semantics, reference model.py:27-28)."""
    w = xavier_normal(key, shape, dtype)
    return w.at[0].set(0.0)


class RecModel(nn.Module):
    # variant axes
    user_tower: str = "sasrec"       # 'sasrec' | 'dssm'
    item_tower: str = "id"           # 'id' | 'modal' | 'modal_id_add' | 'modal_id_cat'
    stage: str = "end2end"           # 'end2end' | 'two_stage'
    # sizes
    item_num: int = 0
    user_num: int = 0                # DSSM only
    embedding_dim: int = 64
    word_embedding_dim: int = 768    # modality encoder output width (two_stage input)
    num_attention_heads: int = 2
    transformer_block: int = 2
    max_seq_len: int = 20
    dnn_layers: int = 0
    mo_dnn_layers: int = 0           # id_plus_mo-2stage: pre-fusion FC depth
    cat_layers: int = 1              # CAT fusion MLP depth (3 = 'modal_cat_3')
    drop_rate: float = 0.1
    # injected modality encoder: content -> (N, embedding_dim) for end2end
    # (text: token rows; vision: images). None for id / two_stage towers.
    encoder: Optional[nn.Module] = None

    def setup(self):
        use_modal = "modal" in self.item_tower
        use_id = (not use_modal) or self.item_tower in ("modal_id_add", "modal_id_cat")

        # ---- user tower ----
        if self.user_tower == "sasrec":
            self.user_encoder = SASRecEncoder(
                d_model=self.embedding_dim,
                n_heads=self.num_attention_heads,
                n_layers=self.transformer_block,
                max_seq_len=self.max_seq_len,
                drop_rate=self.drop_rate,
                name="user_encoder")
        else:  # dssm
            self.user_embedding = nn.Embed(
                self.user_num + 1, self.embedding_dim,
                embedding_init=padded_xavier_normal, name="user_embedding")
            self.user_mlp = MLPEncoder(self.embedding_dim, self.dnn_layers,
                                       self.drop_rate, name="user_mlp")

        # ---- item tower ----
        if use_id:
            self.id_embedding = nn.Embed(
                self.item_num + 1, self.embedding_dim,
                embedding_init=padded_xavier_normal, name="id_embedding")
            if self.user_tower == "dssm" and not use_modal:
                # DSSM IDRec passes the id embedding through its own MLP
                # (bce_text/main-end2end(DSSM)/model/model.py:25-29)
                self.id_encoder = MLPEncoder(self.embedding_dim, self.dnn_layers,
                                             self.drop_rate, name="id_encoder")
        fused_two_stage = (self.stage == "two_stage"
                           and self.item_tower in ("modal_id_add",
                                                   "modal_id_cat"))
        if use_modal:
            if fused_two_stage:
                # id_plus_mo-2stage: a mo_dnn_layers-deep FC stack turns the
                # cached content to embedding_dim BEFORE fusion, and a
                # dnn_layers-deep MLP runs on the FUSED vector
                # (bce_text/id_plus_mo-2stage/model/model.py:25-27,38-40,
                # vision twin bce_vision/id_plus_mo-2stage/model/model.py:25-41)
                self.turn_dim = FCLayers(
                    self.word_embedding_dim, self.embedding_dim,
                    self.mo_dnn_layers, self.drop_rate, name="turn_dim")
                if self.dnn_layers > 0:
                    self.post_mlp = MLPLayers(
                        [self.embedding_dim] * (self.dnn_layers + 1),
                        self.drop_rate, name="post_mlp")
            elif self.stage == "two_stage":
                # frozen-encoder cached embeddings -> FC + MLP trainable head
                # (bce_text/main-2stage(SASRec)/model/encoders.py:7-31)
                self.modal_proj = nn.Dense(self.embedding_dim,
                                           kernel_init=xavier_normal,
                                           bias_init=zeros_init, name="modal_proj")
                if self.dnn_layers > 0:
                    self.modal_mlp = MLPLayers(
                        [self.embedding_dim] * (self.dnn_layers + 1),
                        self.drop_rate, name="modal_mlp")
            else:
                assert self.encoder is not None, "end2end modal tower needs an encoder"

        # ---- fusion ----
        if self.item_tower == "modal_id_add":
            self.fusion = AddFusion(name="fusion")
        elif self.item_tower == "modal_id_cat":
            # the 2-stage CAT is always single-layer (bce_text/
            # id_plus_mo-2stage/model/model.py:31-34 has no cat_3 branch);
            # end2end honors cat_layers ('modal_cat_3',
            # bce_text/id_plus_mo-end2end/model/model.py:28-34)
            n = 1 if fused_two_stage else self.cat_layers
            self.fusion = CatFusion(self.embedding_dim, self.drop_rate,
                                    n_layers=n, name="fusion")

    # ------------------------------------------------------------------ item
    def item_embs(self, item_ids, content=None, deterministic: bool = True):
        """Item tower: ids (+ content) -> (N, embedding_dim).

        content: None for pure-ID; int token rows / images for end2end modal;
        cached float encoder outputs (N, word_embedding_dim) for two_stage.
        """
        use_modal = "modal" in self.item_tower
        if not use_modal:
            emb = self.id_embedding(item_ids)
            if self.user_tower == "dssm":
                emb = self.id_encoder(emb, deterministic)
            return emb

        if (self.stage == "two_stage"
                and self.item_tower in ("modal_id_add", "modal_id_cat")):
            # id_plus_mo-2stage: mlp_layers(fusion(id, turn_dim(content)))
            # (bce_text/id_plus_mo-2stage/model/model.py:49-51)
            modal = self.turn_dim(content, deterministic)
            fused = self.fusion(self.id_embedding(item_ids), modal,
                                deterministic)
            if self.dnn_layers > 0:
                fused = self.post_mlp(fused, deterministic)
            return fused
        if self.stage == "two_stage":
            modal = nn.gelu(self.modal_proj(content), approximate=False)
            if self.dnn_layers > 0:
                modal = self.modal_mlp(modal, deterministic)
        elif content is not None and content.ndim == 4:
            # vision images: thread the pad-item mask so the tower can
            # reproduce the reference's normalized-zero pad image exactly
            # even from the uint8 host pipeline (VisionTower.pad_mask)
            modal = self.encoder(content, deterministic=deterministic,
                                 pad_mask=(item_ids == 0))
        else:
            modal = self.encoder(content, deterministic=deterministic)

        if self.item_tower in ("modal_id_add", "modal_id_cat"):
            return self.fusion(self.id_embedding(item_ids), modal,
                               deterministic)
        return modal

    # ------------------------------------------------------------------ user
    def user_states(self, input_embs, log_mask, deterministic: bool = True):
        """SASRec tower: (B, L, D) embeddings + (B, L) mask -> (B, L, D)."""
        return self.user_encoder(input_embs, log_mask, deterministic)

    def user_vec(self, user_ids, deterministic: bool = True):
        """DSSM tower: (B,) user ids -> (B, D)."""
        return self.user_mlp(self.user_embedding(user_ids), deterministic)

    def __call__(self, item_ids, content, log_mask, user_ids=None,
                 deterministic: bool = True):
        """Convenience forward for init/shape-checking: touches EVERY tower so
        a single init() creates the full parameter tree."""
        embs = self.item_embs(item_ids.reshape(-1),
                              None if content is None else content,
                              deterministic)
        if self.user_tower == "sasrec":
            B, S = item_ids.shape
            embs = embs.reshape(B, S, self.embedding_dim)
            return self.user_states(embs[:, :-1, :], log_mask, deterministic)
        if user_ids is None:
            user_ids = jnp.zeros((item_ids.shape[0],), jnp.int32)
        return self.user_vec(user_ids, deterministic)


def make_model(cfg, item_num: int, user_num: int = 0,
               encoder: Optional[nn.Module] = None) -> RecModel:
    return RecModel(
        user_tower=cfg.user_tower,
        item_tower=cfg.item_tower,
        stage=cfg.stage,
        item_num=item_num,
        user_num=user_num,
        embedding_dim=cfg.embedding_dim,
        word_embedding_dim=cfg.word_embedding_dim,
        num_attention_heads=cfg.num_attention_heads,
        transformer_block=cfg.transformer_block,
        max_seq_len=cfg.max_seq_len,
        dnn_layers=cfg.dnn_layers,
        mo_dnn_layers=cfg.mo_dnn_layers,
        cat_layers=getattr(cfg, "cat_layers", 1),
        drop_rate=cfg.drop_rate,
        encoder=encoder,
    )
