"""Harness that loads the READ-ONLY reference model (torch, CPU) as a golden
parity oracle. The reference needs torchvision (absent in this image) only
for three trivial utilities, which we stub; we also neutralize its hardcoded
.cuda() calls and pretrained-weight download.

Used by tests only — nothing here ships in the framework.
"""

import importlib
import sys
import types
from collections import OrderedDict

import torch

REF_TREES = {
    1: "/root/reference/src/CountDETR_147_1st_stage",
    2: "/root/reference/src/CountDETR_147_2nd_stage",
}


class _IntermediateLayerGetter(torch.nn.ModuleDict):
    """Standard torchvision semantics: run children in order, collect the
    requested layers, stop after the last one."""

    def __init__(self, model, return_layers):
        orig = dict(return_layers)
        layers = OrderedDict()
        remaining = dict(return_layers)
        for name, module in model.named_children():
            layers[name] = module
            if name in remaining:
                del remaining[name]
            if not remaining:
                break
        super().__init__(layers)
        self.return_layers = orig

    def forward(self, x):
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


def _install_torchvision_stub():
    if "torchvision" in sys.modules and getattr(
        sys.modules["torchvision"], "_is_stub", False
    ):
        return
    tv = types.ModuleType("torchvision")
    tv._is_stub = True
    tv.__version__ = "0.9.0"
    models = types.ModuleType("torchvision.models")
    _utils = types.ModuleType("torchvision.models._utils")
    _utils.IntermediateLayerGetter = _IntermediateLayerGetter
    utils = types.ModuleType("torchvision.models.utils")

    def _no_download(*a, **kw):
        raise RuntimeError("no network in tests; use pretrained=False")

    utils.load_state_dict_from_url = _no_download
    ops = types.ModuleType("torchvision.ops")
    misc = types.ModuleType("torchvision.ops.misc")
    misc.interpolate = torch.nn.functional.interpolate
    boxes_mod = types.ModuleType("torchvision.ops.boxes")

    def _box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    boxes_mod.box_area = _box_area
    ops.misc = misc
    ops.boxes = boxes_mod
    models._utils = _utils
    models.utils = utils
    tv.models = models
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models._utils"] = _utils
    sys.modules["torchvision.models.utils"] = utils
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.misc"] = misc
    sys.modules["torchvision.ops.boxes"] = boxes_mod


def _purge_reference_modules():
    for name in list(sys.modules):
        if name in ("models", "util", "datasets", "data", "engine") or name.startswith(
            ("models.", "util.", "datasets.", "data.")
        ):
            del sys.modules[name]


class ReferenceStage:
    """Context manager giving access to one reference tree's modules."""

    def __init__(self, stage: int):
        self.stage = stage
        self.tree = REF_TREES[stage]

    def __enter__(self):
        _install_torchvision_stub()
        _purge_reference_modules()
        sys.path.insert(0, self.tree)
        if self.stage == 2:
            # known reference defect (SURVEY.md 2.10): the 2nd-stage
            # models/__init__.py imports .anchor_center and .centerness,
            # modules that do not exist in the tree. Stub them so the
            # package imports.
            for missing in ("models.anchor_center", "models.centerness"):
                stub = types.ModuleType(missing)
                stub.build_anchor_center = lambda args: None
                stub.build_centerness = lambda args: None
                sys.modules[missing] = stub
        # .cuda() no-op so the reference's hardcoded device moves work on CPU
        self._old_cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **kw: self
        self.util_misc = importlib.import_module("util.misc")
        # pretrained=is_main_process() would download weights; force False
        self._old_main = self.util_misc.is_main_process
        self.util_misc.is_main_process = lambda: False
        self.backbone_mod = importlib.import_module("models.backbone")
        self.backbone_mod.is_main_process = lambda: False
        self.transformer_mod = importlib.import_module("models.transformer")
        self.rcda_mod = importlib.import_module(
            "models.row_column_decoupled_attention"
        )
        return self

    def __exit__(self, *exc):
        torch.Tensor.cuda = self._old_cuda
        self.util_misc.is_main_process = self._old_main
        sys.path.remove(self.tree)
        _purge_reference_modules()
        return False

    def build_model(self, **overrides):
        """Build the reference AnchorDETR (without criterion) on CPU."""
        import argparse

        anchor_mod = importlib.import_module("models.anchor_detr")
        defaults = dict(
            backbone="resnet50",
            dilation=True,
            num_feature_levels=1,
            enc_layers=6,
            dec_layers=6,
            dim_feedforward=1024,
            hidden_dim=256,
            dropout=0.0,
            nheads=8,
            num_query_position=300,
            num_query_pattern=3,
            spatial_prior="learned",
            attention_type="RCDA",
            lr_backbone=1e-5,
            masks=False,
            aux_loss=False,
            frozen_weights=None,
            device="cpu",
        )
        defaults.update(overrides)
        args = argparse.Namespace(**defaults)
        backbone = self.backbone_mod.build_backbone(args)
        transformer = self.transformer_mod.build_transformer(args)
        if self.stage == 1:
            model = anchor_mod.AnchorDETR(
                backbone, transformer, num_feature_levels=args.num_feature_levels
            )
        else:
            model = anchor_mod.AnchorDETR(
                backbone,
                transformer,
                num_feature_levels=args.num_feature_levels,
                aux_loss=args.aux_loss,
            )
        model.eval()
        return model
