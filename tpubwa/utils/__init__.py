from . import dna
