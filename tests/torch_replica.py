"""Torch replica of the HorizonNet architecture — TEST SCAFFOLDING ONLY.

Built from the architecture specification (see SURVEY.md §2 C1-C5) to
validate the checkpoint converter and full-forward numerics without
torchvision. Attribute names are chosen so ``state_dict()`` emits exactly
the reference checkpoint key layout (including the ``.1`` infix that
wrap_lr_pad's Sequential wrapping produces).
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class LRPad(nn.Module):
    """Horizontal circular pad (stateless; occupies Sequential slot 0)."""

    def __init__(self, pad=1):
        super().__init__()
        self.pad = pad

    def forward(self, x):
        return torch.cat([x[..., -self.pad:], x, x[..., :self.pad]], dim=3)


def wrap_conv(cin, cout, k, stride=1, bias=False):
    """Conv with wrap padding on W, zero on H -> keys get the '.1' infix."""
    p = k // 2
    conv = nn.Conv2d(cin, cout, k, stride=stride, padding=(p, 0), bias=bias)
    return nn.Sequential(LRPad(p), conv)


class Bottleneck(nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = wrap_conv(planes, planes, 3, stride)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idn)


class ResNet50Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = wrap_conv(3, 64, 7, 2)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for li, (planes, n, s) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
            blocks = []
            for bi in range(n):
                blocks.append(Bottleneck(cin, planes, s if bi == 0 else 1))
                cin = planes * 4
            setattr(self, f"layer{li+1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        feats = []
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
            feats.append(x)
        return feats


class DenseLayerT(nn.Module):
    """torchvision densenet layer: norm1/conv1(1x1)/norm2/conv2(3x3 wrap)."""

    def __init__(self, cin, growth=32, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = wrap_conv(bn_size * growth, growth, 3)

    def forward(self, x):
        out = self.conv1(F.relu(self.norm1(x)))
        out = self.conv2(F.relu(self.norm2(out)))
        return torch.cat([x, out], 1)


class DenseBlockT(nn.Module):
    def __init__(self, cin, n_layers, growth=32):
        super().__init__()
        for li in range(n_layers):
            self.add_module(f"denselayer{li+1}",
                            DenseLayerT(cin + li * growth, growth))

    def forward(self, x):
        for m in self.children():
            x = m(x)
        return x


class TransitionT(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm = nn.BatchNorm2d(cin)
        self.conv = nn.Conv2d(cin, cout, 1, bias=False)
        self.pool = nn.AvgPool2d(2, 2)

    def forward(self, x):
        return self.pool(self.conv(F.relu(self.norm(x))))


class DenseNet121Encoder(nn.Module):
    """torchvision densenet121.features layout (keys: features.conv0 etc.);
    the reference taps children 4, 6, 8 and relu(norm5(child 10))
    (model.py:102-108)."""

    def __init__(self):
        super().__init__()
        from collections import OrderedDict
        growth, blocks, init = 32, (6, 12, 24, 16), 64
        feats = OrderedDict()
        feats["conv0"] = wrap_conv(3, init, 7, 2)
        feats["norm0"] = nn.BatchNorm2d(init)
        feats["relu0"] = nn.ReLU(inplace=True)
        feats["pool0"] = nn.MaxPool2d(3, 2, 1)
        c = init
        for bi, n in enumerate(blocks):
            feats[f"denseblock{bi+1}"] = DenseBlockT(c, n, growth)
            c += n * growth
            if bi < len(blocks) - 1:
                feats[f"transition{bi+1}"] = TransitionT(c, c // 2)
                c //= 2
        feats["norm5"] = nn.BatchNorm2d(c)
        self.features = nn.Sequential(feats)

    def forward(self, x):
        lst = []
        for m in self.features.children():
            x = m(x)
            lst.append(x)
        return [lst[4], lst[6], lst[8], F.relu(lst[11])]


class CCH(nn.Module):
    """Height-halving conv block; attr name 'layers' matches the reference
    ConvCompressH so state_dict keys line up."""

    def __init__(self, cin, cout):
        super().__init__()
        conv = nn.Conv2d(cin, cout, 3, stride=(2, 1), padding=(1, 0),
                         bias=True)
        self.layers = nn.Sequential(
            nn.Sequential(LRPad(1), conv),
            nn.BatchNorm2d(cout),
            nn.ReLU(inplace=True))

    def forward(self, x):
        return self.layers(x)


class GHC(nn.Module):
    """4x height-halving conv stack + seam-free width resize."""

    def __init__(self, cin, cout):
        super().__init__()
        seq = [cin, cin // 2, cin // 2, cin // 4, cout]
        self.layer = nn.Sequential(*[CCH(seq[j], seq[j + 1])
                                     for j in range(4)])

    def forward(self, x, out_w):
        x = self.layer(x)
        factor = out_w // x.shape[3]
        x = torch.cat([x[..., -1:], x, x[..., :1]], 3)
        x = F.interpolate(x, size=(x.shape[2], out_w + 2 * factor),
                          mode="bilinear", align_corners=False)
        return x[..., factor:-factor]


class TorchHorizonNetReplica(nn.Module):
    x_mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    x_std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def __init__(self, backbone="resnet50", use_rnn=True):
        super().__init__()
        self.use_rnn = use_rnn
        if backbone == "resnet50":
            enc, chans = ResNet50Encoder, (256, 512, 1024, 2048)
        elif backbone == "densenet121":
            enc, chans = DenseNet121Encoder, (256, 512, 1024, 1024)
        else:
            raise ValueError(backbone)

        class _FE(nn.Module):
            def __init__(self):
                super().__init__()
                self.encoder = enc()

        class _RH(nn.Module):
            def __init__(self):
                super().__init__()
                self.ghc_lst = nn.ModuleList(
                    [GHC(c, c // 8) for c in chans])

        self.feature_extractor = _FE()
        self.reduce_height_module = _RH()
        # c_last per model.py:212-215: (c1*8 + c2*4 + c3*2 + c4) / 8
        c1, c2, c3, c4 = chans
        c_last = (c1 * 8 + c2 * 4 + c3 * 2 + c4) // 8
        if use_rnn:
            self.bi_rnn = nn.LSTM(input_size=c_last, hidden_size=512,
                                  num_layers=2, dropout=0.5,
                                  bidirectional=True)
            self.drop_out = nn.Dropout(0.5)
            self.linear = nn.Linear(1024, 12)
        else:
            # no-RNN head (model.py:235-243): keys linear.0 / linear.3
            self.linear = nn.Sequential(
                nn.Linear(c_last, 512), nn.ReLU(inplace=True),
                nn.Dropout(0.5), nn.Linear(512, 12))

    def forward(self, x):
        x = (x - self.x_mean) / self.x_std
        feats = self.feature_extractor.encoder(x)
        out_w = x.shape[3] // 4
        cols = [g(f, out_w).reshape(x.shape[0], -1, out_w)
                for g, f in zip(self.reduce_height_module.ghc_lst, feats)]
        feature = torch.cat(cols, dim=1)           # [B, c_last, out_w]
        if self.use_rnn:
            seq = feature.permute(2, 0, 1)         # [W', B, C]
            out, _ = self.bi_rnn(seq)
            out = self.linear(out)                 # [W', B, 12]
            out = out.view(out.shape[0], out.shape[1], 3, 4)
            out = out.permute(1, 2, 0, 3).reshape(x.shape[0], 3, -1)
        else:
            seq = feature.permute(0, 2, 1)         # [B, W', C]
            out = self.linear(seq)                 # [B, W', 12]
            out = out.view(out.shape[0], out.shape[1], 3, 4)
            out = out.permute(0, 2, 1, 3).reshape(x.shape[0], 3, -1)
        return out[:, 1:], out[:, :1]              # bon, cor


def small_init_(model, scale=0.05):
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.dim() > 1:
                p.normal_(0, scale)
            else:
                p.normal_(0, 0.01)
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.8, 1.2)
    return model
