from rscotr_tpu.models.necks.channel_mapper import ChannelMapper

__all__ = ["ChannelMapper"]
