from inverse_audio_synthesis_tpu.utils.config import Config, load_config
from inverse_audio_synthesis_tpu.utils.utils import git_sha, utcstr
