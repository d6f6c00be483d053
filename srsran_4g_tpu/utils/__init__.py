from srsran_4g_tpu.utils import constants  # noqa: F401
