"""Multi-line and cross-row operators.

- mainstage: padHead/trimHead/tightBelowBullet/fwHead/tightLines/tightClaims
- strip_blank: marker-range blank-line strippers
- blocks: convertForDoc/Family/Cau/Other state machines
- text_transformer: region (above/below/range/head/mark) operators
- dedup / similarity / textstats / multimodal: large-scale pipeline extras
"""
