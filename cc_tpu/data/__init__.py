"""Host-side data pipeline: datasets, joint transforms, threaded loading,
device prefetch. NHWC numpy on the host; static shapes on device."""
from cc_tpu.data.sequence_folders import SequenceFolder
from cc_tpu.data.validation import ValidationSet
from cc_tpu.data.loader import DataLoader, device_prefetch
from cc_tpu.data import transforms

__all__ = ["SequenceFolder", "ValidationSet", "DataLoader",
           "device_prefetch", "transforms"]
