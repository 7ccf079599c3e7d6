"""Model family: encoder, attention, generator, recognizer assembly."""
from attention_lvcsr_tpu.models.recognizer import (  # noqa: F401
    RecognizerNet, SpeechRecognizer, initialize_params, param_path_dict,
    params_from_path_dict)
