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
    """BiLSTM with pack_padded_sequence (true ragged semantics); num_layers
    stacks torch-style with inter-layer dropout."""

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
        # h_n: [num_layers*2, B, h]; the last layer's (fwd, bwd) → [B, 2h]
        h_n = torch.cat([h_n[-2], h_n[-1]], dim=-1)[unsort_idx]
        c_n = torch.cat([c_n[-2], c_n[-1]], dim=-1)[unsort_idx]
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


class SentencePointerDecoder(nn.Module):
    """Mirror of mmbidaf_tpu.models.decoder (additive-attention pointer LSTM)."""

    def __init__(self, m_dim, attn_dim):
        super().__init__()
        self.cell = nn.LSTMCell(m_dim, m_dim)
        self.w_m = nn.Parameter(torch.empty(m_dim, attn_dim).uniform_(-m_dim**-0.5, m_dim**-0.5))
        self.w_d = nn.Parameter(torch.empty(m_dim, attn_dim).uniform_(-m_dim**-0.5, m_dim**-0.5))
        self.v = nn.Parameter(torch.empty(attn_dim).uniform_(-attn_dim**-0.5, attn_dim**-0.5))
        self.start = nn.Parameter(torch.empty(m_dim).uniform_(-m_dim**-0.5, m_dim**-0.5))

    def forward(self, M, sent_mask, targets=None, num_steps=4, mask_selected=True):
        B, T_s, d = M.shape
        h = torch.zeros(B, d)
        c = torch.zeros(B, d)
        inp = self.start.expand(B, d)
        selected = torch.zeros(B, T_s)
        M_keys = M @ self.w_m
        log_ps, picks = [], []
        for k in range(num_steps):
            h, c = self.cell(inp, (h, c))
            scores = torch.tanh(M_keys + (h @ self.w_d).unsqueeze(1)) @ self.v
            avail = sent_mask * (1 - selected) if mask_selected else sent_mask
            masked = avail * scores + (1 - avail) * -1e30
            log_p = F.log_softmax(masked, dim=-1)
            pick = log_p.argmax(dim=-1)
            feed = targets[:, k] if targets is not None else pick
            inp = M[torch.arange(B), feed]
            if mask_selected:
                selected = selected.scatter(1, feed.unsqueeze(1), 1.0)
            log_ps.append(log_p)
            picks.append(pick)
        return torch.stack(log_ps, dim=1), torch.stack(picks, dim=1)


def _encode_varlen(encoder, x, mask):
    """RNNEncoder over sequences that may be fully padded (length 0).

    pack_padded_sequence rejects zero lengths, so they are clamped to 1 and
    the resulting final states zeroed — matching the JAX scan, whose carried
    state stays at the zero init when every step is masked.
    """
    lengths = mask.sum(dim=1).long()
    clamped = lengths.clamp(min=1)
    out, (h_n, c_n) = encoder(x, clamped)
    nonempty = (lengths > 0).float().unsqueeze(1)
    out = out * mask.unsqueeze(2)
    return out, (h_n * nonempty, c_n * nonempty)


class MMBiDAF(nn.Module):
    """Full trimodal model mirroring mmbidaf_tpu.models.mmbidaf semantics."""

    def __init__(self, word_vectors, hidden_size, img_feat_dim=None, audio_feat_dim=None,
                 drop_prob=0.0, num_decode_steps=4, mask_selected=True,
                 num_rnn_layers=1):
        super().__init__()
        h = hidden_size
        L = num_rnn_layers
        self.num_decode_steps = num_decode_steps
        self.mask_selected = mask_selected
        self.emb = Embedding(word_vectors, h, drop_prob)
        self.word_enc = RNNEncoder(h, h, L)
        self.sent_enc = RNNEncoder(2 * h, h, L)
        num_g = 0
        if img_feat_dim is not None:
            self.img_enc = RNNEncoder(img_feat_dim, h, L)
            self.att_img = BiDAFAttention(2 * h, drop_prob)
            num_g += 1
        else:
            self.img_enc = None
        if audio_feat_dim is not None:
            self.aud_enc = RNNEncoder(audio_feat_dim, h, L)
            self.att_aud = BiDAFAttention(2 * h, drop_prob)
            num_g += 1
        else:
            self.aud_enc = None
        if num_g == 0:
            self.att_self = BiDAFAttention(2 * h, drop_prob)
            num_g = 1
        self.fuse = nn.Linear(num_g * 8 * h, 2 * h)
        self.model_enc = RNNEncoder(2 * h, h, L)
        self.decoder = SentencePointerDecoder(2 * h, 2 * h)

    def fused_reps(self, text_ids, word_mask, sent_mask, images=None, img_mask=None,
                   audio=None, aud_mask=None):
        B, T_s, W = text_ids.shape
        emb = self.emb(text_ids)                     # [B, T_s, W, h]
        h2 = emb.size(-1)
        flat = emb.view(B * T_s, W, h2)
        flat_mask = word_mask.view(B * T_s, W)
        _, (h_n, _) = _encode_varlen(self.word_enc, flat, flat_mask)
        sent_vecs = h_n.view(B, T_s, -1)
        text_enc, _ = _encode_varlen(self.sent_enc, sent_vecs, sent_mask)
        gs = []
        if self.img_enc is not None:
            img_enc, _ = _encode_varlen(self.img_enc, images, img_mask)
            gs.append(self.att_img(text_enc, img_enc, sent_mask, img_mask))
        if self.aud_enc is not None:
            aud_enc, _ = _encode_varlen(self.aud_enc, audio, aud_mask)
            gs.append(self.att_aud(text_enc, aud_enc, sent_mask, aud_mask))
        if not gs:
            gs.append(self.att_self(text_enc, text_enc, sent_mask, sent_mask))
        g = torch.cat(gs, dim=-1) if len(gs) > 1 else gs[0]
        fused = F.relu(self.fuse(g))
        M, _ = _encode_varlen(self.model_enc, fused, sent_mask)
        return M

    def forward(self, text_ids, word_mask, sent_mask, targets=None, images=None,
                img_mask=None, audio=None, aud_mask=None):
        M = self.fused_reps(text_ids, word_mask, sent_mask, images, img_mask, audio, aud_mask)
        return self.decoder(M, sent_mask, targets, self.num_decode_steps, self.mask_selected)
