"""PyTorch mirror of the SURVEY.md §2 reference PWC-Net.

The reference mount is empty (SURVEY.md provenance caveat), so this module
encodes the reconstructed reference architecture — ``FeaturePyramidExtractor``
(reference ``modules.py:~10-45``), ``WarpingLayer`` (``modules.py:~45-80``),
pure-torch ``CostVolumeLayer`` (``modules.py:~80-115``),
``OpticalFlowEstimator`` (``modules.py:~115-150``) and ``ContextNetwork``
(``modules.py:~150-180``) assembled as ``Net`` (``model.py:~15-150``) — as a
runnable torch ``nn.Module``. It serves two purposes:

1. The **round-trip oracle** for :mod:`pwcnet_tpu.compat.torch_import`: the
   day a real reference ``.pth`` appears, the importer runs unchanged; until
   then this mirror generates structurally identical ``state_dict``s so the
   import path is tested end-to-end (including forward parity).
2. A **numerics parity oracle**: with identical weights, its forward and the
   flax :class:`~pwcnet_tpu.models.PWCNet` forward must agree to float
   tolerance under matching conventions (PARITY.md rows 1-13).

torch is CPU-only in this environment; everything here is f32 NCHW and only
used in tests/tools, never on the TPU compute path.
"""

from __future__ import annotations

from typing import List

import torch
import torch.nn as nn
import torch.nn.functional as F

PYRAMID_CHANNELS = (16, 32, 64, 96, 128, 196, 224)
ESTIMATOR_CHANNELS = (128, 128, 96, 64, 32)
CONTEXT_SPEC = ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1))


def _conv(cin: int, cout: int, stride: int = 1, dilation: int = 1
          ) -> nn.Sequential:
    """Reference ``conv`` helper: 3x3 conv + LeakyReLU(0.1)."""
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, stride=stride, dilation=dilation,
                  padding=dilation),
        nn.LeakyReLU(0.1, inplace=False))


class FeaturePyramidExtractor(nn.Module):
    """Per-level (conv s2 + conv s1) pairs; returns features fine->coarse."""

    def __init__(self, num_levels: int = 6):
        super().__init__()
        self.convs = nn.ModuleList()
        cin = 3
        for ch in PYRAMID_CHANNELS[:num_levels]:
            self.convs.append(nn.Sequential(_conv(cin, ch, stride=2),
                                            _conv(ch, ch)))
            cin = ch

    def forward(self, x: torch.Tensor) -> List[torch.Tensor]:
        feats = []
        for block in self.convs:
            x = block(x)
            feats.append(x)
        return feats  # finest first (level 1 .. L)


class WarpingLayer(nn.Module):
    """Backward warp via ``F.grid_sample`` + the reference ones-mask."""

    def forward(self, feat: torch.Tensor, flow: torch.Tensor) -> torch.Tensor:
        n, _, h, w = feat.shape
        ys = torch.arange(h, dtype=torch.float32).view(1, h, 1).expand(n, h, w)
        xs = torch.arange(w, dtype=torch.float32).view(1, 1, w).expand(n, h, w)
        sx = xs + flow[:, 0]
        sy = ys + flow[:, 1]
        # Pixel coords -> [-1, 1] with align_corners=True semantics (the
        # reference normalizes by (size - 1)).
        gx = 2.0 * sx / max(w - 1, 1) - 1.0
        gy = 2.0 * sy / max(h - 1, 1) - 1.0
        grid = torch.stack([gx, gy], dim=-1)
        out = F.grid_sample(feat, grid, mode="bilinear",
                            padding_mode="zeros", align_corners=True)
        mask = F.grid_sample(torch.ones_like(feat[:, :1]), grid,
                             mode="bilinear", padding_mode="zeros",
                             align_corners=True)
        return out * (mask >= 0.9999).float()


class CostVolumeLayer(nn.Module):
    """Pure-torch local correlation (mean over C, d=4 -> 81 channels)."""

    def __init__(self, max_displacement: int = 4):
        super().__init__()
        self.d = max_displacement

    def forward(self, f1: torch.Tensor, f2: torch.Tensor) -> torch.Tensor:
        d = self.d
        n, c, h, w = f1.shape
        p2 = F.pad(f2, (d, d, d, d))
        out = []
        for dy in range(-d, d + 1):
            for dx in range(-d, d + 1):
                shifted = p2[:, :, d + dy:d + dy + h, d + dx:d + dx + w]
                out.append((f1 * shifted).mean(dim=1, keepdim=True))
        return torch.cat(out, dim=1)


class OpticalFlowEstimator(nn.Module):
    def __init__(self, cin: int):
        super().__init__()
        layers = []
        for ch in ESTIMATOR_CHANNELS:
            layers.append(_conv(cin, ch))
            cin = ch
        self.convs = nn.Sequential(*layers)
        self.flow_conv = nn.Conv2d(cin, 2, 3, padding=1)

    def forward(self, x: torch.Tensor):
        feat = self.convs(x)
        return feat, self.flow_conv(feat)


class ContextNetwork(nn.Module):
    def __init__(self, cin: int = ESTIMATOR_CHANNELS[-1] + 2):
        super().__init__()
        layers = []
        for ch, dil in CONTEXT_SPEC:
            layers.append(_conv(cin, ch, dilation=dil))
            cin = ch
        self.convs = nn.Sequential(*layers)
        self.flow_conv = nn.Conv2d(cin, 2, 3, padding=1)

    def forward(self, feat: torch.Tensor, flow: torch.Tensor) -> torch.Tensor:
        x = torch.cat([feat, flow], dim=1)
        return self.flow_conv(self.convs(x))


class Net(nn.Module):
    """The assembled reference network (``model.py`` ``Net``).

    Matches the flax :class:`~pwcnet_tpu.models.PWCNet` conventions
    (PARITY.md): flows in scaled units (full-res px / ``flow_scale``), warp
    multiplier ``flow_scale / 2**level``, residual estimators, context net
    at the output level. ``align_corners`` selects the inter-level
    upsampling convention (PARITY row 9; False = half-pixel default).
    """

    def __init__(self, num_levels: int = 6, output_level: int = 4,
                 search_range: int = 4, residual: bool = True,
                 flow_scale: float = 20.0, align_corners: bool = False):
        super().__init__()
        self.num_levels = num_levels
        self.output_level = output_level
        self.flow_scale = flow_scale
        self.align_corners = align_corners
        self.residual = residual
        self.feature_pyramid_extractor = FeaturePyramidExtractor(num_levels)
        self.warping_layer = WarpingLayer()
        self.corr = CostVolumeLayer(search_range)
        corr_ch = (2 * search_range + 1) ** 2
        self.flow_estimators = nn.ModuleList()
        # Registration order = processing order = coarsest first, matching
        # the reference's per-level ModuleList.
        for i in range(output_level + 1):
            level = num_levels - i
            cin = corr_ch + PYRAMID_CHANNELS[level - 1] + 2
            self.flow_estimators.append(OpticalFlowEstimator(cin))
        self.context_networks = ContextNetwork()

    def _up2(self, x: torch.Tensor) -> torch.Tensor:
        return F.interpolate(x, scale_factor=2, mode="bilinear",
                             align_corners=self.align_corners)

    def forward(self, im1: torch.Tensor, im2: torch.Tensor
                ) -> List[torch.Tensor]:
        pyr1 = self.feature_pyramid_extractor(im1)[::-1]
        pyr2 = self.feature_pyramid_extractor(im2)[::-1]
        # pyr[i] is level L - i; the decoder uses the top output_level+1.
        flows = []
        flow = None
        for i in range(self.output_level + 1):
            level = self.num_levels - i
            f1, f2 = pyr1[i], pyr2[i]
            if flow is None:
                up_flow = torch.zeros_like(f1[:, :2])
                warped2 = f2
            else:
                up_flow = self._up2(flow)
                pix = up_flow * (self.flow_scale / (2.0 ** level))
                warped2 = self.warping_layer(f2, pix)
            corr = F.leaky_relu(self.corr(f1, warped2), 0.1)
            x = torch.cat([corr, f1, up_flow], dim=1)
            feat, delta = self.flow_estimators[i](x)
            flow = up_flow + delta if self.residual else delta
            if i == self.output_level:
                flow = flow + self.context_networks(feat, flow)
            flows.append(flow)
        return flows
