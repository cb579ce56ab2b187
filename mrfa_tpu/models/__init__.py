from mrfa_tpu.models.generator import OcclusionAwareGenerator
from mrfa_tpu.models.kp_detector import KPDetector, TPSKPDetector
from mrfa_tpu.models.dense_motion import DenseMotionNetwork, TPSDenseMotionNetwork
from mrfa_tpu.models.bg_motion import BGMotionPredictor
from mrfa_tpu.models.raft import RaftFlow
from mrfa_tpu.models.tokenpose import TokenPoseB
from mrfa_tpu.models.mrfa import MRFA
