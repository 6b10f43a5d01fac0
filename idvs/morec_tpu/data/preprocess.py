"""Host-side dataset preprocessing (pure Python/numpy; runs once, off-device).

Reproduces the reference preprocessing semantics exactly:
- item TSV readers             (reference inbatch_sasrec_e2e_text/data_utils/preprocess.py:84-128)
- behavior reader: min-len filter, [-(max_seq_len+3):] truncation, dense
  re-iding of surviving items, leave-one-out split, per-user histories,
  popularity table with sentinel pop[0]=1
                               (reference preprocess.py:5-81)
- tokenized catalog matrices packed [ids || attention_mask] side by side
                               (reference preprocess.py:131-172, run.py:88-98)
- DSSM pairwise splits         (reference bce_text/main-end2end(DSSM)/data_utils/preprocess.py:5-81)
- vision image manifest -> record-store keys
                               (reference inbatch_sasrec_e2e_vision/data_utils/preprocess.py:88-101)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np


@dataclasses.dataclass
class BehaviorData:
    """Everything read_behaviors produces, as plain numpy/dicts."""
    item_num: int
    item_id_to_dic: Dict[int, object]          # new id -> item content/dict
    users_train: Dict[int, List[int]]
    users_valid: Dict[int, List[int]]
    users_test: Dict[int, List[int]]
    users_history_for_valid: Dict[int, np.ndarray]
    users_history_for_test: Dict[int, np.ndarray]
    item_name_to_id: Dict[str, int]
    pop_prob_list: np.ndarray                  # (item_num+1,), pop[0]=1 sentinel


def read_items_text(news_path: str):
    """ID-mode item reader: name -> dense id (reference preprocess.py:84-98)."""
    item_id_to_dic = {}
    item_id_to_name = {}
    item_name_to_id = {}
    item_id = 1
    with open(news_path, "r") as f:
        for line in f:
            splited = line.strip("\n").split("\t")
            doc_name = splited[0]
            item_name_to_id[doc_name] = item_id
            item_id_to_dic[item_id] = doc_name
            item_id_to_name[item_id] = doc_name
            item_id += 1
    # reference appends a mask sentence at item_id (preprocess.py:97)
    item_id_to_dic[item_id] = "this is a mask sentence"
    return item_id_to_dic, item_name_to_id, item_id_to_name


def read_items_tokenized(news_path: str, cfg, tokenizer):
    """Tokenize item text attributes to fixed length (reference preprocess.py:101-128).

    Tokenization stays host-side (HF tokenizers), outside the jitted path.
    """
    item_id_to_dic = {}
    item_id_to_name = {}
    item_name_to_id = {}
    item_id = 1
    with open(news_path, "r") as f:
        for line in f:
            splited = line.strip("\n").split("\t")
            doc_name, title, abstract = splited[0], splited[1], splited[2]
            tok = {}
            if "title" in cfg.news_attributes:
                tok["title"] = tokenizer(title.lower(), max_length=cfg.num_words_title,
                                         padding="max_length", truncation=True)
            if "abstract" in cfg.news_attributes:
                tok["abstract"] = tokenizer(abstract.lower(), max_length=cfg.num_words_abstract,
                                            padding="max_length", truncation=True)
            if "body" in cfg.news_attributes:
                body = splited[3] if len(splited) > 3 else ""
                tok["body"] = tokenizer(body.lower()[:2000], max_length=cfg.num_words_body,
                                        padding="max_length", truncation=True)
            item_name_to_id[doc_name] = item_id
            item_id_to_name[item_id] = doc_name
            item_id_to_dic[item_id] = tok
            item_id += 1
    return item_id_to_dic, item_name_to_id, item_id_to_name


def read_image_manifest(images_path: str) -> Tuple[dict, dict, dict]:
    """Vision manifest: item name 'v123' -> store key b'123'.

    Reference inbatch_sasrec_e2e_vision/data_utils/preprocess.py:88-101.
    """
    item_id_to_keys = {}
    item_name_to_id = {}
    item_id_to_name = {}
    item_id = 1
    with open(images_path, "r") as f:
        for line in f:
            splited = line.strip("\n").split("\t")
            image_name = splited[0]
            item_name_to_id[image_name] = item_id
            item_id_to_name[item_id] = image_name
            item_id_to_keys[item_id] = str(image_name[1:]).encode("ascii")
            item_id += 1
    return item_id_to_keys, item_name_to_id, item_id_to_name


def read_behaviors(behaviors_path: str,
                   before_item_id_to_dic: dict,
                   before_item_name_to_id: dict,
                   before_item_id_to_name: dict,
                   max_seq_len: int,
                   min_seq_len: int,
                   log=None) -> BehaviorData:
    """Reference preprocess.py:5-81, numpy edition. Invariants preserved:

    - sequences shorter than min_seq_len dropped
    - truncation keeps the LAST max_seq_len+3 interactions
    - items with zero post-filter count are removed; survivors densely re-ided
      in ORIGINAL id order starting at 1
    - leave-one-out: train = seq[:-2], valid = seq[-(L+2):-1], test = seq[-(L+1):]
    - histories: valid-history = train part, test-history = seq[:-1]
    - pop_prob = train_counts^1.0 normalized over ids 1..item_num, sentinel
      pop[0] = 1 so log(pop[0]) = 0 for padding
    """
    before_item_num = len(before_item_name_to_id)
    before_item_counts = np.zeros(before_item_num + 1, dtype=np.int64)
    user_seq_dic = {}
    pairs_num = 0
    with open(behaviors_path, "r") as f:
        for line in f:
            splited = line.strip("\n").split("\t")
            user_name = splited[0]
            history_item_name = splited[1].split(" ")
            if len(history_item_name) < min_seq_len:
                continue
            history_item_name = history_item_name[-(max_seq_len + 3):]
            item_ids_sub_seq = [before_item_name_to_id[i] for i in history_item_name]
            user_seq_dic[user_name] = item_ids_sub_seq
            for item_id in item_ids_sub_seq:
                before_item_counts[item_id] += 1
                pairs_num += 1
    if log:
        log.info("##### pairs_num {}".format(pairs_num))

    item_id = 1
    item_id_to_dic = {}
    item_name_to_id = {}
    item_id_before_to_now = {}
    for before_item_id in range(1, before_item_num + 1):
        if before_item_counts[before_item_id] != 0:
            item_id_before_to_now[before_item_id] = item_id
            item_id_to_dic[item_id] = before_item_id_to_dic[before_item_id]
            item_name_to_id[before_item_id_to_name[before_item_id]] = item_id
            item_id += 1
    item_num = len(item_id_before_to_now)

    users_train, users_valid, users_test = {}, {}, {}
    users_history_for_valid, users_history_for_test = {}, {}
    train_item_counts = np.zeros(item_num + 1, dtype=np.int64)
    user_id = 0
    for user_name, item_seqs in user_seq_dic.items():
        user_seq = [item_id_before_to_now[i] for i in item_seqs]
        train = user_seq[:-2]
        valid = user_seq[-(max_seq_len + 2):-1]
        test = user_seq[-(max_seq_len + 1):]
        users_train[user_id] = train
        users_valid[user_id] = valid
        users_test[user_id] = test
        for i in train:
            train_item_counts[i] += 1
        users_history_for_valid[user_id] = np.asarray(train, dtype=np.int64)
        users_history_for_test[user_id] = np.asarray(user_seq[:-1], dtype=np.int64)
        user_id += 1

    item_counts_powered = np.power(train_item_counts.astype(np.float64), 1.0)
    pop_body = item_counts_powered[1:item_num + 1]
    pop_body = pop_body / pop_body.sum()
    pop_prob_list = np.concatenate([[1.0], pop_body]).astype(np.float64)

    return BehaviorData(
        item_num=item_num,
        item_id_to_dic=item_id_to_dic,
        users_train=users_train,
        users_valid=users_valid,
        users_test=users_test,
        users_history_for_valid=users_history_for_valid,
        users_history_for_test=users_history_for_test,
        item_name_to_id=item_name_to_id,
        pop_prob_list=pop_prob_list,
    )


@dataclasses.dataclass
class PairBehaviorData:
    """DSSM pairwise splits (reference bce_text/main-end2end(DSSM)/data_utils/preprocess.py:5-81)."""
    user_num: int
    item_num: int
    item_id_to_content: Dict[int, object]
    users_train: Dict[int, List[int]]
    users_valid: Dict[int, List[int]]
    train_pairs: np.ndarray    # (P, 2) [user, item]
    valid_pairs: np.ndarray
    test_pairs: np.ndarray
    users_history_for_valid: Dict[int, np.ndarray]
    users_history_for_test: Dict[int, np.ndarray]


def read_behaviors_pairs(behaviors_path: str,
                         before_item_id_to_dic: dict,
                         before_item_name_to_id: dict,
                         min_seq_len: int,
                         max_seq_len: int,
                         log=None) -> PairBehaviorData:
    """DSSM variant: (user, item) interaction pairs; users ided from 1."""
    before_item_num = len(before_item_name_to_id)
    before_item_counts = np.zeros(before_item_num + 1, dtype=np.int64)
    user_seq_dic = {}
    with open(behaviors_path, "r") as f:
        for line in f:
            splited = line.strip("\n").split("\t")
            user_name = splited[0]
            history_item_name = splited[1].split(" ")
            if len(history_item_name) < min_seq_len:
                continue
            history_item_name = history_item_name[-(max_seq_len + 3):]
            item_ids_sub_seq = [before_item_name_to_id[i] for i in history_item_name]
            user_seq_dic[user_name] = item_ids_sub_seq
            for item_id in item_ids_sub_seq:
                before_item_counts[item_id] += 1

    item_id = 1
    item_id_to_content = {}
    item_id_before_to_now = {}
    for before_item_id in range(1, before_item_num + 1):
        if before_item_counts[before_item_id] != 0:
            item_id_before_to_now[before_item_id] = item_id
            item_id_to_content[item_id] = before_item_id_to_dic[before_item_id]
            item_id += 1
    item_num = len(item_id_before_to_now)

    users_train, users_valid = {}, {}
    users_history_for_valid, users_history_for_test = {}, {}
    train_pairs, valid_pairs, test_pairs = [], [], []
    user_id = 1
    for user_name, item_seqs in user_seq_dic.items():
        user_seq = [item_id_before_to_now[i] for i in item_seqs]
        train = user_seq[:-2]
        valid = user_seq[:-1]
        users_train[user_id] = train
        users_valid[user_id] = valid
        users_history_for_valid[user_id] = np.asarray(train, dtype=np.int64)
        users_history_for_test[user_id] = np.asarray(valid, dtype=np.int64)
        for i in train:
            train_pairs.append((user_id, i))
        valid_pairs.append((user_id, valid[-1]))
        test_pairs.append((user_id, user_seq[-1]))
        user_id += 1

    return PairBehaviorData(
        user_num=len(user_seq_dic),
        item_num=item_num,
        item_id_to_content=item_id_to_content,
        users_train=users_train,
        users_valid=users_valid,
        train_pairs=np.asarray(train_pairs, dtype=np.int64),
        valid_pairs=np.asarray(valid_pairs, dtype=np.int64),
        test_pairs=np.asarray(test_pairs, dtype=np.int64),
        users_history_for_valid=users_history_for_valid,
        users_history_for_test=users_history_for_test,
    )


def build_doc_matrix(item_id_to_dic: Dict[int, dict], cfg) -> np.ndarray:
    """Pack tokenized attributes into one (item_num+1, sum(2*L_attr)) int32 matrix.

    Layout per attribute: [input_ids || attention_mask] side by side, attributes
    concatenated in (title, abstract, body) order — identical to the reference's
    get_doc_input_bert + np.concatenate (preprocess.py:131-172, run.py:88-98).
    Row 0 is the all-zero padding item.
    """
    item_num = len(item_id_to_dic) + 1
    blocks = []
    for attr, nwords in (("title", cfg.num_words_title),
                         ("abstract", cfg.num_words_abstract),
                         ("body", cfg.num_words_body)):
        if attr not in cfg.news_attributes:
            continue
        ids = np.zeros((item_num, nwords), dtype=np.int32)
        att = np.zeros((item_num, nwords), dtype=np.int32)
        for item_id in range(1, item_num):
            tok = item_id_to_dic[item_id][attr]
            ids[item_id] = tok["input_ids"]
            att[item_id] = tok["attention_mask"]
        blocks.extend([ids, att])
    return np.concatenate(blocks, axis=1)
