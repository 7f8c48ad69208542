from mggan_tpu.ops import linear, lstm, social, losses, sampling, cnn  # noqa: F401
