"""Deterministic synthetic `documents` table generator (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
    documents(doc_id string,
              spans array<struct<kind string, text string,
                                 media_ref string, offset int>>)

- text spans drawn from JPO office-action patterns observed in the reference
  fixtures (/root/reference/sample/例文_{1,2,3}.txt) so every SURVEY §2
  operator fires;
- media spans (figure/table) interleaved, carried through bit-identical;
- ~20% of docs get their physical span order permuted (offset sort must
  restore it);
- ~0.5% mega-documents (100-1000x median span count) to exercise skew salting.

All generation is seeded — no wall clock, no unseeded RNG.
"""

from __future__ import annotations

import random

# Ingredient lines exercising each operator family (FIXTURES.md §1 table).
_HEADINGS = [
    "１．（進歩性）この出願の下記の請求項に係る発明は特許を受けることができない。",
    "2.BBB",
    "（１）相違点１について",
    "(A)構成の対比",
    "1.2.3.細部の検討",
    "第１章　総論",
    "3)分説",
    "A.構成要件",
]
_BULLETS = [
    "・請求項　１－６",
    "・引用文献等　１－３",
    "●理由１（進歩性）について",
    "・調査した分野 IPC H04B 7/24- 7/26",
    "<付記>",
    "-留意事項",
]
_STATUTES = [
    "特許法第２９条第２項の規定により特許を受けることができない。",
    "この出願は、特許法第17条の2第4項に規定する要件を満たしていない。",
    "ＰＣＴ第3条に規定された国際出願である。",
    "特許法施行規則様式第１３備考４、５に従い記載されたい。",
    "令和2年3月12日に提出された手続補正書を検討した。",
    "第２９条第１項第３号に該当する。",
]
_CITATIONS = [
    "引用文献1(特に段落[0001]、[0003]-[0008]、図1、4a、式(2)、表5b参照)",
    "請求項1-6に係る発明について",
    "段落［３２４２］及び［３２５０］を参照されたい。",
    "第2.12.X.3節、第21頁を参照。",
    "引用文献1、2及び5に記載された発明",
    "UEは、DCIを受信し（段落[００２７]、[００６５]、[００９８]-[００９９]、図１、６-８）動作する。",
]
_MARKERS = [
    "記",
    "記 (引用文献等については引用文献等一覧参照)",
    "<引用文献等一覧>",
    "------------------------------------",
    "<先行技術文献調査結果の記録>",
    "<補正をする際の注意>",
    "<補正の示唆>",
    "<ファミリー文献情報>",
    "<優先権の主張の効果について>",
    "この先行技術文献調査結果の記録は、拒絶理由を構成するものではありません。",
    "この拒絶理由通知の内容に関するお問合せ又は面接のご希望がありましたら、次の連絡先までご連絡ください。補正案等の送付を希望される際は、その旨を事前にご連絡ください。",
]
_PRIOR_ART = [
    "・調査した分野 IPC H04B 7/24- 7/26",
    "H04W 4/00- 99/00",
    "DB名 IEEE 802.11",
    "DB名 3GPP TSG RAN WG1-4",
    "SA WG1-4、6",
    "CT WG1、4",
    "・先行技術文献 特開２０２０－１２３４５６号公報",
    "特開2019-000001号公報",
    "米国特許出願公開第2020/0123456号明細書",
]
_SIGNATURE = [
    "　審査第四部伝送システム(PA5J) 飯星 陽平(いいほし ようへい)",
    "　TEL.03-3581-1101 内線3534",
    "　※●●●●@Jpo.Go.Jp (上記「●●●●」に置き換えて、「PA5J」と入力ください。)",
]
_TECH = [
    "ＩＥＥＥ 802.11の規格に従いwifi通信を行う。",
    "WPA2-PSKによる認証を行う。rrc setup requestを送信する。",
    "gnbはnb-iotのueにsnr測定を指示する。nr方式である。",
    "H O は分離されたままである。",
    "基地局はrrc connection reconfiguration completeを受信する。",
]
_PARA_BODY = [
    "[0016] 本実施形態では、無線通信システムについて説明する。",
    "【００２７】",
    "本発明の装置は、プロセッサとメモリとを備える。",
    "【背景技術】",
    "Description",
    "DETAILED DESCRIPTION",
    "ＵＥは基地局からＤＣＩを受信する。",
    "The apparatus includes ａ processor.",
]
_CLAIMS = [
    "『請求項１に係る発明は、\n\n受信部と、\n\n制御部とを備える装置。』",
    "『データを受信する工程と、\n処理する工程とを含む方法。』",
]
_NOISE = [
    "　　全角　スペース　まじり　",
    "half  and　full　width  mixed",
    "Ａ-Ｚ０-９の全角英数字を含む行",
    "tab\tand\x0bvertical",
    "ゼロ幅​文字と制御\x01文字",
]

_POOLS = [
    _HEADINGS, _BULLETS, _STATUTES, _CITATIONS, _MARKERS,
    _PRIOR_ART, _SIGNATURE, _TECH, _PARA_BODY, _CLAIMS, _NOISE,
]


def make_document_text(rng: random.Random, n_blocks: int | None = None) -> str:
    """One synthetic office-action-ish document string."""
    if n_blocks is None:
        n_blocks = rng.randint(8, 30)
    parts: list[str] = []
    for _ in range(n_blocks):
        pool = rng.choice(_POOLS)
        parts.append(rng.choice(pool))
        if rng.random() < 0.35:
            parts.append("")  # blank line noise
        if rng.random() < 0.08:
            parts.append("　" * rng.randint(1, 3))  # whitespace-only line
    eol = rng.choice(["\n", "\n", "\n", "\r\n", "\r"])
    return eol.join(parts)


def make_documents_rows(
    n_docs: int,
    seed: int = 42,
    median_text_spans: int = 10,
    media_spans: int = 2,
    permute_frac: float = 0.2,
    mega_frac: float = 0.005,
    mega_multiplier: int = 100,
) -> list[dict]:
    """Rows for the interleaved documents table (FIXTURES.md §1)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        doc_id = f"doc-{i:06d}"
        n_text = max(1, int(rng.gauss(median_text_spans, median_text_spans / 4)))
        if rng.random() < mega_frac:
            n_text *= rng.randint(mega_multiplier, mega_multiplier * 10)
        n_media = rng.randint(0, media_spans * 2)

        spans = []
        offset = 0
        media_left = n_media
        for _ in range(n_text):
            # each text span is a small run of lines
            txt = make_document_text(rng, n_blocks=rng.randint(1, 4))
            spans.append({"kind": "text", "text": txt, "media_ref": "", "offset": offset})
            offset += 1
            if media_left and rng.random() < 0.3:
                kind = rng.choice(["figure", "table"])
                spans.append({
                    "kind": kind,
                    "text": "",
                    "media_ref": f"media://{kind}/{rng.randint(0, 9999):04d}",
                    "offset": offset,
                })
                offset += 1
                media_left -= 1

        if rng.random() < permute_frac:
            rng.shuffle(spans)

        rows.append({"doc_id": doc_id, "spans": spans})
    return rows


def doc_text_from_spans(spans: list[dict]) -> str:
    """A document's plain text = '\\n'.join(kind='text' span texts by offset)
    (FIXTURES.md §1 semantics)."""
    texts = sorted(
        (s for s in spans if s["kind"] == "text"), key=lambda s: s["offset"]
    )
    return "\n".join(s["text"] for s in texts)
