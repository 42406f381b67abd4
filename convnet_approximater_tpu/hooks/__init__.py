from .hook import HOOK, Hook, build_hook
from .priority import Priority, get_priority
from .checkpoint import CkptHook
from .model_analysis import ModelAnalysis, analyze_model, count_params
from .inference_time_hook import InferenceTimeHook, time_forward
from .fps import Fps
from .low_rank_exp_v1_decomp import LowRankExpV1Decomp
from .class_eval_hook import ClassEvalHook
from .calibration import CalibrationHook, strip_second_moment
from .finetune import CheckpointSaver, L2Reconstruct, make_optimizer, update_summary
from .qat import PrepareQAT
