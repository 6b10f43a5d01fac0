from .logging import setuplogger, para_and_log, report_time_train, report_time_eval, get_time
