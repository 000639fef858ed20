from graphqembed_tpu.utils.debug import checked_margin_loss, validate_ids  # noqa: F401
