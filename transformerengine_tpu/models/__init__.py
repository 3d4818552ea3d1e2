"""Flagship model families built from the framework's Flax modules:
Llama (dense GQA), Mixtral (sparse MoE), Gemma (GeGLU/MQA)."""
from . import gemma, gptoss, llama, mixtral
