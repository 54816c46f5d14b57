"""yolou_tpu: TPU-native JAX framework with the capabilities of YOLO-Seg++.

Public API surface (stable import points):

    from yolou_tpu import build_yolo, YOLOSegPP, Predictor, Evaluator
    from yolou_tpu import DecoderTrainer, DetectorTrainer
"""

__version__ = "0.1.0"

from .models.yolo import YOLOModel, YoloOutputs, build_yolo, parse_model_spec  # noqa: F401
from .models.segpp import YOLOSegPP, SegPPDecoder  # noqa: F401


def __getattr__(name):
    # lazy heavy imports (engine pulls cv2 etc.)
    if name == "Predictor":
        from .engine.predictor import Predictor
        return Predictor
    if name == "Evaluator":
        from .engine.evaluator import Evaluator
        return Evaluator
    if name == "DecoderTrainer":
        from .engine.trainer_decoder import DecoderTrainer
        return DecoderTrainer
    if name == "DetectorTrainer":
        from .engine.trainer_detector import DetectorTrainer
        return DetectorTrainer
    if name == "Results":
        from .engine.results import Results
        return Results
    raise AttributeError(name)
