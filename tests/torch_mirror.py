"""Test-only torch mirror of the nnU-Net PlainConvUNet 2D architecture.

Used as the numerical oracle for the JAX implementation and the checkpoint
converter: it reproduces the module structure and state-dict naming that
nnU-Net v2 checkpoints use, without depending on nnunetv2 itself.
"""

import torch
import torch.nn as nn

from totalsegmentator2d_tpu.models.plans import ArchSpec


class ConvDropoutNormReLU(nn.Module):
    def __init__(self, cin, cout, kernel, stride, spec: ArchSpec):
        super().__init__()
        k = kernel
        self.conv = nn.Conv2d(cin, cout, k, stride=stride,
                              padding=tuple((x - 1) // 2 for x in k),
                              bias=spec.conv_bias)
        self.norm = nn.InstanceNorm2d(cout, eps=spec.norm_eps,
                                      affine=spec.norm_affine)
        self.nonlin = nn.LeakyReLU(spec.nonlin_slope)

    def forward(self, x):
        return self.nonlin(self.norm(self.conv(x)))


class StackedConvBlocks(nn.Module):
    def __init__(self, n, cin, cout, kernel, first_stride, spec):
        super().__init__()
        blocks = [ConvDropoutNormReLU(cin, cout, kernel, first_stride, spec)]
        for _ in range(n - 1):
            blocks.append(ConvDropoutNormReLU(cout, cout, kernel, (1, 1), spec))
        self.convs = nn.Sequential(*blocks)

    def forward(self, x):
        return self.convs(x)


class Encoder(nn.Module):
    def __init__(self, spec: ArchSpec):
        super().__init__()
        stages = []
        cin = spec.in_channels
        for s in range(spec.n_stages):
            stages.append(StackedConvBlocks(
                spec.n_conv_per_stage[s], cin, spec.features_per_stage[s],
                spec.kernel_sizes[s], spec.strides[s], spec))
            cin = spec.features_per_stage[s]
        self.stages = nn.Sequential(*stages)

    def forward(self, x):
        skips = []
        for st in self.stages:
            x = st(x)
            skips.append(x)
        return skips


class Decoder(nn.Module):
    def __init__(self, spec: ArchSpec):
        super().__init__()
        n_dec = spec.n_stages - 1
        transpconvs, stages, seg_layers = [], [], []
        for d in range(n_dec):
            enc_stage = n_dec - d
            cbelow = spec.features_per_stage[enc_stage]
            cskip = spec.features_per_stage[enc_stage - 1]
            stride = spec.strides[enc_stage]
            transpconvs.append(nn.ConvTranspose2d(cbelow, cskip, stride, stride))
            stages.append(StackedConvBlocks(
                spec.n_conv_per_stage_decoder[d], 2 * cskip, cskip,
                spec.kernel_sizes[enc_stage - 1], (1, 1), spec))
            seg_layers.append(nn.Conv2d(cskip, spec.out_channels, 1))
        self.transpconvs = nn.ModuleList(transpconvs)
        self.stages = nn.ModuleList(stages)
        self.seg_layers = nn.ModuleList(seg_layers)

    def forward(self, skips):
        x = skips[-1]
        n_dec = len(self.stages)
        for d in range(n_dec):
            enc_stage = n_dec - d
            x = self.transpconvs[d](x)
            x = torch.cat([x, skips[enc_stage - 1]], dim=1)
            x = self.stages[d](x)
        return self.seg_layers[-1](x)


class TorchPlainConvUNet(nn.Module):
    def __init__(self, spec: ArchSpec):
        super().__init__()
        self.encoder = Encoder(spec)
        self.decoder = Decoder(spec)

    def forward(self, x):
        return self.decoder(self.encoder(x))


def make_spec(in_channels=2, out_channels=5, n_stages=4,
              features=None) -> ArchSpec:
    return ArchSpec(
        n_stages=n_stages,
        features_per_stage=(tuple(features) if features is not None else
                            tuple(min(8 * 2 ** i, 32)
                                  for i in range(n_stages))),
        kernel_sizes=((3, 3),) * n_stages,
        strides=((1, 1),) + ((2, 2),) * (n_stages - 1),
        n_conv_per_stage=(2,) * n_stages,
        n_conv_per_stage_decoder=(2,) * (n_stages - 1),
        in_channels=in_channels,
        out_channels=out_channels,
    )
