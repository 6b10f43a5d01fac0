"""Dual file+screen logging in the reference's format
(data_utils/utils.py:21-58,92-133). Single-process on TPU, so no rank gating.
"""

from __future__ import annotations

import logging
import math
import os
import time


def setuplogger(dir_label: str, log_paras: str, time_run: str, mode: str,
                behaviors: str = ""):
    formatter = logging.Formatter("[%(levelname)s %(asctime)s] %(message)s")
    log_file = logging.getLogger("Log_file")
    log_screen = logging.getLogger("Log_screen")
    # reset handlers (repeat calls in one process)
    log_file.handlers.clear()
    log_screen.handlers.clear()

    if "train" in mode:
        log_path = os.path.join("./logs_" + dir_label + "_" + "train")
        os.makedirs(log_path, exist_ok=True)
        log_file_name = os.path.join(log_path, "log_" + log_paras + time_run + ".log")
    elif "test" in mode:
        log_file_name = "log_test_all_" + behaviors.split("_")[0] + ".log"
    else:
        log_file_name = "log_other_" + behaviors.split("_")[0] + ".log"

    log_file.setLevel(logging.INFO)
    log_screen.setLevel(logging.INFO)
    th = logging.FileHandler(filename=log_file_name, encoding="utf-8")
    th.setFormatter(formatter)
    log_file.addHandler(th)
    handler = logging.StreamHandler()
    handler.setFormatter(formatter)
    log_screen.addHandler(handler)
    log_file.addHandler(handler)
    return log_file, log_screen


def get_time(start_time, end_time):
    time_g = int(end_time - start_time)
    return time_g // 3600, (time_g // 60) % 60, time_g % 60


def para_and_log(n_params_total: int, n_params_trainable: int, seq_num: int,
                 batch_size: int, log_file, logging_num: int, testing_num: int):
    log_file.info("##### total_num {} #####".format(n_params_total))
    log_file.info("##### trainable_num {} #####".format(n_params_trainable))
    step_num = math.ceil(seq_num / batch_size)
    log_file.info("##### all {} steps #####".format(step_num))
    steps_for_log = max(1, int(step_num / logging_num))
    steps_for_test = max(1, int(step_num / testing_num))
    log_file.info("##### {} logs/epoch; {} steps/log #####".format(logging_num, steps_for_log))
    return steps_for_log, steps_for_test


def report_time_train(batch_index, now_epoch, loss, next_set_start_time,
                      start_time, log_file):
    loss /= max(batch_index, 1)
    log_file.info("epoch: {} end, train_loss: {:.5f}".format(now_epoch, loss))
    end = time.time()
    h, m, s = get_time(next_set_start_time, end)
    log_file.info("##### (time) this epoch set: {} hours {} minutes {} seconds #####".format(h, m, s))
    h, m, s = get_time(start_time, end)
    log_file.info("##### (time) start until now: {} hours {} minutes {} seconds #####".format(h, m, s))
    return time.time()


def report_time_eval(start_time, log_file):
    h, m, s = get_time(start_time, time.time())
    log_file.info("##### (time) eval(valid and test): {} hours {} minutes {} seconds #####".format(h, m, s))


def print_metrics(x, log_file, v_or_t):
    log_file.info(v_or_t + "_results   {}".format(
        "\t".join("{:0.5f}".format(i * 100) for i in x)))
