from . import fasta, maps, phylip
from .fasta import load_fasta
from .phylip import parse_phylip
