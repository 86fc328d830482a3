from .argoverse import ArgoverseSequenceDataset
from .base import SequenceDataset, SequenceSource
from .openpcdet import OpenPCDetSequenceDataset
from .synthetic import SyntheticDataset, SyntheticSequence
from .waymo import WaymoSequenceDataset

__all__ = ["SequenceDataset", "SequenceSource", "SyntheticDataset",
           "SyntheticSequence", "OpenPCDetSequenceDataset",
           "WaymoSequenceDataset", "ArgoverseSequenceDataset"]
