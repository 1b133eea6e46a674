from idccrn_vae_tpu.data.audio_io import read_wav, write_wav, resample  # noqa: F401
from idccrn_vae_tpu.data.segments import (  # noqa: F401
    build_segment_index,
    SegmentDataset,
)
from idccrn_vae_tpu.data.loader import BatchLoader  # noqa: F401
