from inverse_audio_synthesis_tpu.ops.pallas.render import (
    fused_render_supported,
    render_audio_fused,
)
