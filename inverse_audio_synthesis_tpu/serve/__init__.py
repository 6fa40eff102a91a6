from inverse_audio_synthesis_tpu.serve.export import (
    export_embed_audio,
    export_predict_params,
    export_render,
    load_exported,
    save_exported,
    write_manifest,
)

__all__ = [
    "export_embed_audio",
    "export_predict_params",
    "export_render",
    "load_exported",
    "save_exported",
    "write_manifest",
]
