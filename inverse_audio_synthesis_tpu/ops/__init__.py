from inverse_audio_synthesis_tpu.ops.imgscale8 import scale8, unscale8
from inverse_audio_synthesis_tpu.ops.pqmf import PQMF
