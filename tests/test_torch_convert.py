"""Reference-numerics cross-check (VERDICT item 8).

Runs the ACTUAL reference model (torch, CPU, /root/reference sources with
igraph stubbed out — its only use is batching, which the raw-buffer API
bypasses exactly like the reference's own unit tests,
test_GraphConvModule.py:34) and asserts our flax model produces the same
logits after converting the torch state_dict with learn.convert_torch.

This de-risks the S3DIS Area-5 parity claim without the dataset: any
numerics drift in PointNet/STN/fnet/ECC/GRU/classifier shows up here.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "learning")),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    if "igraph" not in sys.modules:
        sys.modules["igraph"] = types.ModuleType("igraph")  # GraphConvInfo.py:11
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import learning.graphnet as ref_graphnet
    import learning.pointnet as ref_pointnet

    # The reference's GraphConvModule.forward (used only by the crf token)
    # instantiates the autograd function legacy-style, which modern torch
    # rejects; shim it to the modern `.apply` call with identical arguments
    # (exactly how RNNGraphConvModule invokes the same function,
    # modules.py:175-176).
    import learning.ecc as ref_ecc

    def _gcm_forward(self, input):
        idxn, idxe, degs, degs_gpu, edgefeats = self._gci.get_buffers()
        weights = self._fnet(edgefeats)
        if weights.size(1) == self._in_channels * self._out_channels:
            weights = weights.view(-1, self._in_channels, self._out_channels)
        return ref_ecc.GraphConvFunction.apply(
            input, weights, self._in_channels, self._out_channels,
            idxn, idxe, degs, degs_gpu, self._edge_mem_limit,
        )

    ref_ecc.GraphConvModule.forward = _gcm_forward
    return torch, ref_graphnet, ref_pointnet


class GciStub:
    """Raw-buffer GraphConvInfo (the reference tests build these directly)."""

    def __init__(self, torch, idxn, degs, edgefeats):
        self._b = (
            torch.LongTensor(idxn), None, torch.LongTensor(degs),
            torch.LongTensor(degs), torch.FloatTensor(edgefeats),
        )

    def get_buffers(self):
        return self._b

    def get_pyg_buffers(self):
        return None


def _random_graph(rng, n_sp, n_edges, edge_dim):
    """Edges SORTED BY TARGET (the reference layout: GraphConvInfo.py:33-69)."""
    tgt = np.sort(rng.randint(0, n_sp, n_edges)).astype(np.int64)
    src = rng.randint(0, n_sp, n_edges).astype(np.int64)
    degs = np.bincount(tgt, minlength=n_sp).astype(np.int64)
    ef = rng.randn(n_edges, edge_dim).astype(np.float32)
    return src, tgt, degs, ef


def _randomize_torch(model, rng):
    import torch

    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.from_numpy(
                rng.randn(*p.shape).astype(np.float32) * 0.3
            ))
        for name, buf in model.named_buffers():
            if name.endswith("running_var"):
                buf.copy_(torch.from_numpy(
                    rng.rand(*buf.shape).astype(np.float32) + 0.5
                ))
            elif name.endswith("running_mean"):
                buf.copy_(torch.from_numpy(
                    rng.randn(*buf.shape).astype(np.float32) * 0.2
                ))


@pytest.mark.parametrize(
    "config,prelast_do",
    [("gru_3_0,f_6", 0.0), ("gru_2,f_6", 0.5), ("lstm_2_0,f_6", 0.0),
     ("gru_2_0,f_6,crf_2", 0.0)],
)
def test_logits_match_reference(ref_modules, config, prelast_do):
    torch, ref_graphnet, ref_pointnet = ref_modules
    import jax.numpy as jnp

    from superpoint_graph_tpu.learn.convert_torch import convert_state_dict
    from superpoint_graph_tpu.models import SpgModel
    from superpoint_graph_tpu.models.spgmodel import SpgBatch

    rng = np.random.RandomState(7)
    n_sp, n_pts, n_ch, n_edges, edge_dim = 20, 24, 11, 70, 13
    ptn_widths = ((16, 32), (32, 24, 32))
    stn_widths = ((8, 16), (16, 8))
    fnet_widths = (edge_dim, 16, 32)

    # --- reference model on CPU ---
    tmodel = torch.nn.Module()
    tmodel.ecc = ref_graphnet.GraphNetwork(
        config, nfeat=ptn_widths[1][-1], fnet_widths=list(fnet_widths),
        fnet_orthoinit=True, fnet_llbias=False, fnet_bnidx=1,
        use_pyg=False, cuda=False,
    )
    tmodel.ptn = ref_pointnet.PointNet(
        list(ptn_widths[0]), list(ptn_widths[1]), list(stn_widths[0]),
        list(stn_widths[1]), nfeat=n_ch, nfeat_stn=n_ch,
        prelast_do=prelast_do,
    )
    _randomize_torch(tmodel, rng)
    tmodel.eval()

    clouds = rng.randn(n_sp, n_pts, n_ch).astype(np.float32)
    glob = rng.rand(n_sp, 1).astype(np.float32)
    src, tgt, degs, ef = _random_graph(rng, n_sp, n_edges, edge_dim)

    with torch.no_grad():
        emb_t = tmodel.ptn(
            torch.from_numpy(clouds.transpose(0, 2, 1)),
            torch.from_numpy(glob),
        )
        gci = GciStub(torch, src, degs, ef)
        tmodel.ecc.set_info([gci] * len(tmodel.ecc.gconvs), cuda=False)
        logits_t = tmodel.ecc(emb_t).numpy()

    # --- ours, from the converted state_dict ---
    model = SpgModel(
        n_classes=6, model_config=config, ptn_widths=ptn_widths,
        ptn_widths_stn=stn_widths, ptn_nfeat=n_ch, ptn_nfeat_stn=n_ch,
        ptn_prelast_do=prelast_do, fnet_widths=fnet_widths,
        fnet_llbias=False, fnet_bnidx=1,
    )
    variables = convert_state_dict(tmodel.state_dict(), model)
    variables = {
        k: jnp.asarray(v) if not isinstance(v, dict) else v
        for k, v in variables.items()
    }
    batch = SpgBatch(
        clouds=jnp.asarray(clouds),
        clouds_global=jnp.asarray(glob),
        cloud_mask=jnp.ones(n_sp, bool),
        node_mask=jnp.ones(n_sp, bool),
        targets=jnp.zeros(n_sp, jnp.int32),
        target_size=jnp.zeros((n_sp, 7), jnp.int32),
        src=jnp.asarray(src.astype(np.int32)),
        tgt=jnp.asarray(tgt.astype(np.int32)),
        edge_feats=jnp.asarray(ef),
        edge_mask=jnp.ones(n_edges, bool),
    )
    logits_j = np.asarray(model.apply(variables, batch, train=False))

    assert logits_j.shape == logits_t.shape
    err = np.abs(logits_j - logits_t).max()
    assert err < 1e-3, f"max |delta logit| = {err}"


def test_checkpoint_roundtrip_via_file(ref_modules, tmp_path):
    """torch.save -> load_reference_checkpoint rebuilds the model from the
    checkpoint's own args (main.py:398) and converts the weights."""
    torch, ref_graphnet, ref_pointnet = ref_modules
    import argparse

    from superpoint_graph_tpu.learn.convert_torch import (
        load_reference_checkpoint,
    )

    rng = np.random.RandomState(3)
    tmodel = torch.nn.Module()
    tmodel.ecc = ref_graphnet.GraphNetwork(
        "gru_2,f_6", nfeat=16, fnet_widths=[13, 16],
        fnet_orthoinit=True, fnet_llbias=False, fnet_bnidx=-1,
        use_pyg=False, cuda=False,
    )
    tmodel.ptn = ref_pointnet.PointNet(
        [16, 16], [16, 16], [8], [8], nfeat=11, nfeat_stn=11, prelast_do=0.0,
    )
    _randomize_torch(tmodel, rng)
    args = argparse.Namespace(
        model_config="gru_2,f_6", ptn_widths=[[16, 16], [16, 16]],
        ptn_widths_stn=[[8], [8]], fnet_widths=[13, 16], fnet_llbias=0,
        fnet_bnidx=-1, ptn_nfeat_stn=11, ptn_prelast_do=0.0,
        inv_class_map={i: str(i) for i in range(6)},
    )
    path = tmp_path / "model.pth.tar"
    torch.save(
        {"epoch": 3, "args": args, "state_dict": tmodel.state_dict(),
         "optimizer": {}, "scaler": None},
        path,
    )
    args2, variables, model = load_reference_checkpoint(str(path))
    assert model.model_config == "gru_2,f_6"
    assert "ptn" in variables["params"] and "ecc" in variables["params"]
