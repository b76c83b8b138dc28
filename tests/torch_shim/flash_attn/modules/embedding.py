import torch
from torch import nn


class GPT2Embeddings(nn.Module):
    """Word (+ optional learned position) embeddings; param names match
    flash-attn (`word_embeddings`, `position_embeddings`)."""

    def __init__(self, embed_dim, vocab_size, max_position_embeddings,
                 padding_idx=None, word_embed_proj_dim=None, device=None,
                 dtype=None):
        super().__init__()
        assert word_embed_proj_dim is None, "proj dim not needed by configs"
        factory_kwargs = {"device": device, "dtype": dtype}
        self.word_embeddings = nn.Embedding(
            vocab_size, embed_dim, padding_idx=padding_idx, **factory_kwargs
        )
        self.max_position_embeddings = max_position_embeddings
        if max_position_embeddings > 0:
            self.position_embeddings = nn.Embedding(
                max_position_embeddings, embed_dim, **factory_kwargs
            )

    def forward(self, input_ids, position_ids=None, combine_batch_seqlen_dim=False):
        emb = self.word_embeddings(input_ids)
        if self.max_position_embeddings > 0:
            if position_ids is None:
                position_ids = torch.arange(
                    input_ids.shape[1], device=input_ids.device
                )
            emb = emb + self.position_embeddings(position_ids)
        return emb


class ParallelGPT2Embeddings(nn.Module):
    def __init__(self, *a, **k):
        raise NotImplementedError("tensor-parallel path not shimmed")
