"""Self-built PyTorch oracle for numerical-parity tests.

The reference mount is empty (SURVEY.md §0), so per SURVEY §8 risk R6 the
parity oracle is re-implemented here from the behavioral spec in SURVEY §9:
the CS224N squad-starter block semantics (HighwayEncoder, RNNEncoder with
pack_padded_sequence, trilinear BiDAFAttention with product-form Q2C) that
the MMBiDAF lineage uses. Torch is a TEST dependency only — nothing in
``mmbidaf_tpu`` imports it.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def masked_softmax(logits, mask, dim=-1, log_softmax=False):
    mask = mask.type(torch.float32)
    masked_logits = mask * logits + (1 - mask) * -1e30
    softmax_fn = F.log_softmax if log_softmax else F.softmax
    return softmax_fn(masked_logits, dim)


class HighwayEncoder(nn.Module):
    def __init__(self, num_layers, hidden_size):
        super().__init__()
        self.transforms = nn.ModuleList(
            [nn.Linear(hidden_size, hidden_size) for _ in range(num_layers)]
        )
        self.gates = nn.ModuleList(
            [nn.Linear(hidden_size, hidden_size) for _ in range(num_layers)]
        )

    def forward(self, x):
        for gate, transform in zip(self.gates, self.transforms):
            g = torch.sigmoid(gate(x))
            t = F.relu(transform(x))
            x = g * t + (1 - g) * x
        return x


class Embedding(nn.Module):
    """GloVe lookup (frozen) → linear proj (no bias) → highway."""

    def __init__(self, word_vectors, hidden_size, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob
        self.embed = nn.Embedding.from_pretrained(word_vectors)
        self.proj = nn.Linear(word_vectors.size(1), hidden_size, bias=False)
        self.hwy = HighwayEncoder(2, hidden_size)

    def forward(self, x):
        emb = self.embed(x)
        emb = F.dropout(emb, self.drop_prob, self.training)
        emb = self.proj(emb)
        emb = self.hwy(emb)
        return emb


class RNNEncoder(nn.Module):
    """1-layer BiLSTM with pack_padded_sequence (true ragged semantics)."""

    def __init__(self, input_size, hidden_size, num_layers=1, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob
        self.rnn = nn.LSTM(
            input_size,
            hidden_size,
            num_layers,
            batch_first=True,
            bidirectional=True,
            dropout=drop_prob if num_layers > 1 else 0.0,
        )

    def forward(self, x, lengths):
        orig_len = x.size(1)
        lengths, sort_idx = lengths.sort(0, descending=True)
        x = x[sort_idx]
        x = nn.utils.rnn.pack_padded_sequence(x, lengths.cpu(), batch_first=True)
        self.rnn.flatten_parameters()
        x, (h_n, c_n) = self.rnn(x)
        x, _ = nn.utils.rnn.pad_packed_sequence(
            x, batch_first=True, total_length=orig_len
        )
        _, unsort_idx = sort_idx.sort(0)
        x = x[unsort_idx]
        # h_n: [2, B, h] (fwd, bwd) → [B, 2h]
        h_n = torch.cat([h_n[0], h_n[1]], dim=-1)[unsort_idx]
        c_n = torch.cat([c_n[0], c_n[1]], dim=-1)[unsort_idx]
        x = F.dropout(x, self.drop_prob, self.training)
        return x, (h_n, c_n)


class BiDAFAttention(nn.Module):
    """Trilinear similarity + C2Q + product-form Q2C (SURVEY §9)."""

    def __init__(self, hidden_size, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob
        self.c_weight = nn.Parameter(torch.zeros(hidden_size, 1))
        self.q_weight = nn.Parameter(torch.zeros(hidden_size, 1))
        self.cq_weight = nn.Parameter(torch.zeros(1, 1, hidden_size))
        for weight in (self.c_weight, self.q_weight, self.cq_weight):
            nn.init.xavier_uniform_(weight)
        self.bias = nn.Parameter(torch.zeros(1))

    def get_similarity_matrix(self, c, q):
        c = F.dropout(c, self.drop_prob, self.training)
        q = F.dropout(q, self.drop_prob, self.training)
        s0 = torch.matmul(c, self.c_weight).expand([-1, -1, q.size(1)])
        s1 = torch.matmul(q, self.q_weight).transpose(1, 2).expand([-1, c.size(1), -1])
        s2 = torch.matmul(c * self.cq_weight, q.transpose(1, 2))
        return s0 + s1 + s2 + self.bias

    def forward(self, c, q, c_mask, q_mask):
        batch_size, c_len, _ = c.size()
        q_len = q.size(1)
        s = self.get_similarity_matrix(c, q)
        c_mask = c_mask.view(batch_size, c_len, 1)
        q_mask = q_mask.view(batch_size, 1, q_len)
        s1 = masked_softmax(s, q_mask, dim=2)
        s2 = masked_softmax(s, c_mask, dim=1)
        a = torch.bmm(s1, q)
        b = torch.bmm(torch.bmm(s1, s2.transpose(1, 2)), c)
        return torch.cat([c, a, c * a, c * b], dim=2)
