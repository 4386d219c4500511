from .snr import snr_db  # noqa: F401
