from inverse_audio_synthesis_tpu.synth.config import SynthConfig
from inverse_audio_synthesis_tpu.synth.parameter import ParamSpec, from_0to1, to_0to1
from inverse_audio_synthesis_tpu.synth.voice import Voice, VOICE_PARAM_SPECS
