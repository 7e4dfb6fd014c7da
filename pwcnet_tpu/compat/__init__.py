"""Interop with the reference PyTorch implementation.

``torch_import`` converts a reference ``.pth`` ``state_dict`` into this
framework's flax parameter tree; ``torch_ref`` is a runnable PyTorch
mirror of the SURVEY.md §2 reference architecture used as the round-trip
and forward-parity oracle (the reference mount is empty, so the mirror
encodes the reconstructed spec).
"""

from pwcnet_tpu.compat.torch_import import (import_torch_checkpoint,
                                            import_torch_state_dict)

__all__ = ["import_torch_state_dict", "import_torch_checkpoint"]
