"""Independent torch oracle for compression-policy semantics.

These functions re-derive the reference math (window softmax scoring, pooling,
top-k select) directly from its documented behavior so the JAX implementation
can be checked against an executable spec on unpadded inputs.  Test-only; the
framework itself never imports torch.
"""

import math

import torch
import torch.nn.functional as F


def window_scores(q, k, window, reduce="sum"):
    """q, k: [H, S, D] float32 (unpadded). Returns [H, S - window] scores."""
    H, S, D = q.shape
    w = window
    attn = torch.matmul(q[:, -w:, :], k.transpose(1, 2)) / math.sqrt(D)  # [H, w, S]
    tri = torch.full((w, w), torch.finfo(torch.float32).min)
    idx = torch.arange(w)
    tri.masked_fill_(idx < (idx + 1).view(w, 1), 0)
    attn[:, :, -w:] += tri
    probs = F.softmax(attn, dim=-1, dtype=torch.float32)
    if reduce == "sum":
        return probs[:, :, :-w].sum(dim=1)
    return probs[:, :, :-w].mean(dim=1)


def h2o_scores(q, k, window):
    """Full-query heavy-hitter scores with the reference's tail-only causal mask."""
    H, S, D = q.shape
    w = window
    attn = torch.matmul(q, k.transpose(1, 2)) / math.sqrt(D)  # [H, S, S]
    tri = torch.full((w, w), torch.finfo(torch.float32).min)
    idx = torch.arange(w)
    tri.masked_fill_(idx < (idx + 1).view(w, 1), 0)
    attn[:, -w:, -w:] += tri
    probs = F.softmax(attn, dim=-1, dtype=torch.float32)
    return probs[:, :, :-w].sum(dim=1)


def pool(scores, kernel_size, pooling):
    """[H, n] -> [H, n] torch same-pad pooling, stride 1."""
    x = scores.unsqueeze(0)
    if pooling == "avgpool":
        out = F.avg_pool1d(x, kernel_size=kernel_size, padding=kernel_size // 2, stride=1)
    else:
        out = F.max_pool1d(x, kernel_size=kernel_size, padding=kernel_size // 2, stride=1)
    return out.squeeze(0)


def snapkv_select(q, k, v, window, capacity, kernel_size, pooling):
    """Returns (keys, values) [H, capacity, D]: top-(cap-w) + window."""
    H, S, D = q.shape
    w = window
    scores = pool(window_scores(q, k, w, "sum"), kernel_size, pooling)
    idx = scores.topk(capacity - w, dim=-1).indices  # [H, cap-w]
    idxe = idx.unsqueeze(-1).expand(-1, -1, D)
    k_sel = k[:, :-w].gather(1, idxe) if False else k.gather(1, idxe)
    v_sel = v.gather(1, idxe)
    k_out = torch.cat([k_sel, k[:, -w:]], dim=1)
    v_out = torch.cat([v_sel, v[:, -w:]], dim=1)
    return k_out, v_out, idx


def pyramid_layer_budget(cap, window, q_len, beta, num_layers, layer_idx):
    base = cap - window
    min_num = base // beta
    max_num = base * 2 - min_num
    if max_num >= q_len - window:
        max_num = q_len - window
        min_num = base * 2 - max_num
    steps = (max_num - min_num) // (num_layers - 1)
    if q_len < cap:
        return None  # no compress
    if q_len < 2 * base:
        return base
    return max_num - layer_idx * steps


def adakv_head_budgets(scores_sorted_desc, base, floor_ratio, normalize):
    """scores_sorted_desc: [H, n] sorted descending. Returns [H] int budgets."""
    H, n = scores_sorted_desc.shape
    adaptive = scores_sorted_desc.clone()
    if normalize:
        ratio = adaptive[:, :base].sum(-1, keepdim=True) / adaptive.sum(-1, keepdim=True)
        adaptive = adaptive * ratio
    flat = adaptive.reshape(H * n)
    top = torch.topk(flat, H * base).indices
    heads = top // n
    counts = torch.zeros(H, dtype=torch.float32).scatter_add_(
        0, heads, torch.ones_like(heads, dtype=torch.float32))
    floor_cap = int(base * floor_ratio)
    return torch.round(counts * (1 - floor_ratio) + floor_cap).int()


def think_channel_mask(q, k_compressed, ratio):
    """Returns bool [H, D] keep-mask (True = channel kept)."""
    H, S, D = k_compressed.shape
    kdrop = int(D * ratio)
    qn = q[:, -32:, :].pow(2).mean(dim=1)  # [H, D]
    kn = k_compressed.pow(2).mean(dim=1)  # [H, D]
    sal = qn * kn
    drop = torch.topk(sal, kdrop, dim=-1, largest=False).indices
    keep = torch.ones(H, D, dtype=torch.bool)
    keep.scatter_(1, drop, False)
    return keep


def hqq_quantize_spec(x, nbits, group_size=64, optimize=True, iters=20,
                      lp_norm=0.7, beta=1e1, kappa=1.01):
    """HQQ-style per-group asymmetric quantizer roundtrip (torch, fp32).

    Reproduces the reference cache's quantization core
    (pyramidkv/quantcache.py:29-41 delegates to hqq.core.quantize.Quantizer
    with axis=1, group_size=64): groups of ``group_size`` along the last dim,
    scale = qmax / (max - min), zero = -min * scale, plus HQQ's proximal
    zero-point refinement (half-quadratic shrinkage on the lp<1 error norm,
    the HQQ paper's optimize_weights_proximal) when ``optimize``.

    Returns the dequantized reconstruction with x's shape.
    """
    shape = x.shape
    g = x.reshape(-1, group_size).float()
    qmax = 2.0 ** nbits - 1.0
    mx = g.max(dim=1, keepdim=True).values
    mn = g.min(dim=1, keepdim=True).values
    scale = qmax / (mx - mn).clamp_min(1e-8)
    zero = -mn * scale
    if optimize:
        best_err = None
        for _ in range(iters):
            q = (g * scale + zero).round_().clamp_(0, qmax)
            r = (q - zero) / scale
            e = g - r
            # shrink_lp: sign(e) * relu(|e| - (1/beta) * |e|^(p-1))
            ae = e.abs()
            shrunk = torch.sign(e) * torch.relu(
                ae - (1.0 / beta) * ae.clamp_min(1e-8).pow(lp_norm - 1))
            zero = torch.mean(q - (g - shrunk) * scale, dim=1, keepdim=True)
            beta *= kappa
            err = (g - (q - zero) / scale).abs().pow(lp_norm).mean()
            if best_err is not None and err > best_err:
                break
            best_err = err
    q = (g * scale + zero).round_().clamp_(0, qmax)
    return ((q - zero) / scale).reshape(shape)


def hqq_outlier_roundtrip(x, nbits, group_size=64, outlier_threshold=6.0,
                          optimize=True):
    """Full reference quantized-cache roundtrip spec: strip |x| > threshold
    outliers (zeroed before quantization, stored exactly, scattered back
    after dequant — quantcache.py:43-58), HQQ-quantize the rest."""
    outliers = x.abs() > outlier_threshold
    vals = x[outliers]
    stripped = x.masked_fill(outliers, 0.0)
    out = hqq_quantize_spec(stripped, nbits, group_size, optimize=optimize)
    out[outliers] = vals
    return out
