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
