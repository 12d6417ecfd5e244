"""Sequence/transcript helpers (reference: src/core/datasets/utils.py)."""

from typing import Any, Iterable, List, Tuple

import numpy as np


def create_tf_input(transcript: Iterable[int], sos_i: int) -> np.ndarray:
    """SOS + transcript (teacher-forcing decoder input)."""
    return np.array([sos_i] + list(transcript), dtype=np.int64)


def create_tf_target(transcript: Iterable[int], eos_i: int) -> np.ndarray:
    """transcript + EOS (teacher-forcing decoder target)."""
    return np.array(list(transcript) + [eos_i], dtype=np.int64)


def summarize_list(the_list: List[Any]) -> Tuple[List[Any], List[int]]:
    """Run-length encode: [4, 5, 5, 6] -> ([4, 5, 6], [1, 2, 1])."""
    summary: List[Any] = []
    lens: List[int] = []
    if len(the_list) > 0:
        current = the_list[0]
        summary.append(current)
        lens.append(1)
        for item in the_list[1:]:
            if item != current:
                current = item
                summary.append(item)
                lens.append(1)
            else:
                lens[-1] += 1
    return summary, lens


def unsummarize_list(labels: List[int], lengths: List[int]) -> List[int]:
    """Inverse of summarize_list."""
    assert len(labels) == len(lengths)
    the_sequence: List[int] = []
    for label, length in zip(labels, lengths):
        the_sequence.extend([label] * length)
    return the_sequence


def segment_to_labels(transcript, lengths) -> np.ndarray:
    """Expand (transcript, per-segment lengths) to frame-level labels."""
    transcript, lengths = np.asarray(transcript), np.asarray(lengths)
    return np.repeat(transcript, lengths)
