from idccrn_vae_tpu.utils.config import IniConfig, load_ini  # noqa: F401
from idccrn_vae_tpu.utils.logger import get_logger  # noqa: F401
