"""applyFlexibleMap — normalizing longest-match trie replacement.

Exact semantics of /root/reference/js/textUtilsConvertForCau.js:576-1280:
~330-entry canonical-casing map for 3GPP/radio/IT terms + 22 boundary-required
two-letter tokens + the boundary-sensitive key {"nr"}.

Keys are normalized by dropping [\\s\\-_] and lowercasing.  Each ASCII chunk
([A-Za-z0-9][A-Za-z0-9\\s_-]*) is scanned left-to-right with the longest
applicable match; boundary-sensitive entries require non-word chars on both
sides in the ORIGINAL text; conditional shorts additionally require the raw
matched span to contain no separator (so "H O" never becomes "HO").

Unlike the reference (which rebuilds the trie on every call —
textUtilsConvertForCau.js:1168-1178), the trie here is built ONCE at module
import and shared by every Arrow batch on the executor.
"""

from __future__ import annotations

import functools
import re

REPLACE_MAP = {
    # 基本 / プラットフォーム / OS
    "gnb": "gNB", "pa5j": "PA5J",
    "ios": "iOS", "ipados": "iPadOS", "macos": "macOS", "watchos": "watchOS",
    "tvos": "tvOS", "android": "Android", "androidos": "Android",
    "wearos": "Wear OS", "harmonyos": "HarmonyOS",
    "wifi": "Wi-Fi", "wlan": "WLAN", "bluetooth": "Bluetooth", "ble": "BLE",
    "nfc": "NFC", "uwb": "UWB",
    "gnss": "GNSS", "gps": "GPS", "glonass": "GLONASS", "galileo": "Galileo",
    "beidou": "BeiDou", "qzss": "QZSS",
    "appleid": "Apple ID", "icloud": "iCloud", "airdrop": "AirDrop",
    "airplay": "AirPlay", "facetime": "FaceTime", "imessage": "iMessage",
    "appstore": "App Store", "googleplay": "Google Play", "playstore": "Play Store",
    # 標準化団体 / 仕様文書
    "3gpp": "3GPP", "etsi": "ETSI", "itu": "ITU", "ietf": "IETF", "ieee": "IEEE",
    # RAT / 無線方式 / 3GPP世代
    "lte": "LTE", "ltea": "LTE-A", "lteadvanced": "LTE-Advanced",
    "lteapro": "LTE-A Pro",
    "nr": "NR", "5g": "5G", "5gc": "5GC",
    "emtc": "eMTC", "nbiot": "NB-IoT", "catm1": "Cat-M1", "cat1": "Cat-1",
    "redcap": "RedCap",
    "umts": "UMTS", "wcdma": "WCDMA", "hspa": "HSPA", "hsdpa": "HSDPA",
    "hsupa": "HSUPA", "gsm": "GSM", "geran": "GERAN", "utran": "UTRAN",
    "eutran": "E-UTRAN", "eutra": "E-UTRA",
    "embb": "eMBB", "urllc": "URLLC", "mmtc": "mMTC", "ciot": "CIoT",
    "lpwa": "LPWA",
    # RAN ノード / 構成 / O-RAN / WG
    "enb": "eNB", "ngenb": "ng-eNB", "enodeb": "eNodeB", "gnodeb": "gNodeB",
    "cucp": "CU-CP", "cuup": "CU-UP", "gnbdu": "gNB-DU", "gnbcu": "gNB-CU",
    "gnbcucp": "gNB-CU-CP", "gnbcuup": "gNB-CU-UP",
    "oran": "O-RAN", "ric": "RIC", "nearrtric": "Near-RT RIC",
    "nonrtric": "Non-RT RIC", "smo": "SMO", "e2ap": "E2AP",
    "a1": "A1", "o1": "O1", "o2": "O2",
    "ran1": "RAN1", "ran2": "RAN2", "ran3": "RAN3", "sa2": "SA2", "sa3": "SA3",
    "ct1": "CT1", "ct3": "CT3",
    # セル / CA・DC / TAG・TMG
    "mrdc": "MR-DC", "endc": "EN-DC", "nrdc": "NR-DC", "nedc": "NE-DC",
    "mcg": "MCG", "scg": "SCG", "spcell": "SpCell", "pscell": "PSCell",
    "pcell": "PCell", "scell": "SCell", "servingcell": "ServingCell",
    "tag": "TAG", "ptag": "pTAG", "stag": "sTAG", "pstag": "psTAG",
    "tmg": "TMG", "tmgs": "TMGs", "trp": "TRP", "multitrp": "multi-TRP",
    # 物理層 / 多重 / 変調 / チャネル / 信号
    "mimo": "MIMO", "beamforming": "Beamforming", "tdd": "TDD", "fdd": "FDD",
    "ofdm": "OFDM", "ofdma": "OFDMA", "scfdma": "SC-FDMA", "qam": "QAM",
    "qpsk": "QPSK", "bpsk": "BPSK", "ldpc": "LDPC", "polar": "Polar",
    "fec": "FEC",
    "pucch": "PUCCH", "pusch": "PUSCH", "pdcch": "PDCCH", "pdsch": "PDSCH",
    "pbch": "PBCH", "prach": "PRACH", "srs": "SRS", "ssb": "SSB",
    "csirs": "CSI-RS", "dmrs": "DMRS", "ptrs": "PTRS", "prs": "PRS",
    "trs": "TRS",
    "dci": "DCI", "uci": "UCI", "harq": "HARQ", "bwp": "BWP", "cce": "CCE",
    "coreset": "CORESET", "searchspace": "SearchSpace", "mcs": "MCS",
    "tbs": "TBS", "cqi": "CQI", "pmi": "PMI", "cri": "CRI",
    # ランダムアクセス / 同期
    "rach": "RACH", "cfra": "CFRA", "cbra": "CBRA",
    "timingadvance": "Timing Advance", "preamble": "Preamble",
    # 測定 / 品質
    "rsrp": "RSRP", "rsrq": "RSRQ", "sinr": "SINR", "snr": "SNR",
    # L2/L3 / RAN プロトコル / インタフェース
    "rlc": "RLC", "mac": "MAC", "pdcp": "PDCP", "rrc": "RRC", "nas": "NAS",
    "s1ap": "S1AP", "x2ap": "X2AP", "xnap": "XnAP", "ngap": "NGAP",
    "f1ap": "F1AP", "e1ap": "E1AP",
    "s1": "S1", "x2": "X2", "xn": "Xn", "e1": "E1", "f1": "F1",
    "f1c": "F1-C", "f1u": "F1-U", "ngc": "NG-C", "ngu": "NG-U",
    "n1": "N1", "n2": "N2", "n3": "N3", "n4": "N4", "n6": "N6", "n8": "N8",
    "n10": "N10", "n11": "N11", "n12": "N12", "n13": "N13", "n14": "N14",
    "n15": "N15", "n16": "N16",
    "gtp": "GTP", "gtpc": "GTP-C", "gtpu": "GTP-U", "sctp": "SCTP",
    "udp": "UDP", "tcp": "TCP", "ipv4": "IPv4", "ipv6": "IPv6",
    # RRC 状態 / 手順 / シグナリング
    "idle": "IDLE", "inactive": "INACTIVE", "connected": "CONNECTED",
    "mib": "MIB", "sib": "SIB", "sib1": "SIB1", "sib2": "SIB2",
    "sib3": "SIB3", "sib4": "SIB4", "sib5": "SIB5",
    "rrc setup request": "RRC Setup Request", "rrc setup": "RRC Setup",
    "rrc setup complete": "RRC Setup Complete", "rrc reject": "RRC Reject",
    "rrc resume request": "RRC Resume Request", "rrc resume": "RRC Resume",
    "rrc resume complete": "RRC Resume Complete", "rrc release": "RRC Release",
    "rrc reconfiguration": "RRC Reconfiguration",
    "rrc reconfiguration complete": "RRC Reconfiguration Complete",
    "rrc reestablishment request": "RRC Reestablishment Request",
    "rrc reestablishment": "RRC Reestablishment",
    "rrc reestablishment complete": "RRC Reestablishment Complete",
    "rrc reestablishment reject": "RRC Reestablishment Reject",
    "security mode command": "Security Mode Command",
    "security mode complete": "Security Mode Complete",
    "security mode failure": "Security Mode Failure",
    "ue capability enquiry": "UE Capability Enquiry",
    "ue capability information": "UE Capability Information",
    "measurement report": "Measurement Report",
    "counter check": "Counter Check",
    "counter check response": "Counter Check Response",
    "ul information transfer": "UL Information Transfer",
    "dl information transfer": "DL Information Transfer",
    "rrc connection reconfiguration": "RRCConnectionReconfiguration",
    "rrc connection reconfiguration complete": "RRCConnectionReconfigurationComplete",
    "rrc connection reestablishment": "RRCConnectionReestablishment",
    "rrc connection reestablishment request": "RRCConnectionReestablishmentRequest",
    "rrc connection reestablishment complete": "RRCConnectionReestablishmentComplete",
    "rrc connection release": "RRCConnectionRelease",
    "rrc connection setup": "RRCConnectionSetup",
    "rrc connection setup complete": "RRCConnectionSetupComplete",
    "rrc connection request": "RRCConnectionRequest",
    # NAS / Mobility / 状態遷移 / 手順
    "registration": "Registration", "deregistration": "Deregistration",
    "attach": "Attach", "detach": "Detach", "paging": "Paging",
    "handover": "Handover", "reselection": "Reselection", "rlf": "RLF",
    "radio link failure": "Radio Link Failure", "rlm": "RLM", "bfd": "BFD",
    "outofsync": "out-of-sync", "insync": "in-sync", "meas": "Meas",
    "measid": "MeasId", "measobject": "MeasObject",
    "reportconfig": "ReportConfig",
    "eventa1": "Event A1", "eventa2": "Event A2", "eventa3": "Event A3",
    "eventa4": "Event A4", "eventa5": "Event A5",
    # EPC / 5GC / IMS / 音声
    "epc": "EPC", "mme": "MME", "sgw": "SGW", "sgateway": "SGW",
    "pgw": "PGW", "pgateway": "PGW", "hss": "HSS", "pcrf": "PCRF",
    "amf": "AMF", "smf": "SMF", "upf": "UPF", "ausf": "AUSF", "udm": "UDM",
    "udr": "UDR", "pcf": "PCF", "nrf": "NRF", "nef": "NEF", "nssf": "NSSF",
    "ladn": "LADN", "smsf": "SMSF", "sepp": "SEPP", "scp": "SCP",
    "bsf": "BSF", "nwdaf": "NWDAF", "ims": "IMS", "volte": "VoLTE",
    "vonr": "VoNR", "vowifi": "VoWiFi", "csfb": "CSFB", "srvcc": "SRVCC",
    "esrvcc": "eSRVCC",
    # QoS / セッション / ベアラ
    "qos": "QoS", "qci": "QCI", "5qi": "5QI", "qfi": "QFI", "ambr": "AMBR",
    "gbr": "GBR", "nongbr": "non-GBR", "arp": "ARP",
    "reflectiveqos": "Reflective QoS", "pdu": "PDU",
    "pdu session": "PDU Session", "srb": "SRB", "drb": "DRB", "erab": "E-RAB",
    # 識別子 / 加入者情報 / セル識別
    "esim": "eSIM", "euicc": "eUICC", "imsi": "IMSI", "imei": "IMEI",
    "meid": "MEID", "iccid": "ICCID", "msisdn": "MSISDN", "guti": "GUTI",
    "supi": "SUPI", "suci": "SUCI", "tmsi": "TMSI", "ptmsi": "P-TMSI",
    "stmsi": "S-TMSI", "plmn": "PLMN", "tai": "TAI", "cgi": "CGI",
    "ecgi": "ECGI", "ncgi": "NCGI", "pci": "PCI", "arfcn": "ARFCN",
    "earfcn": "EARFCN", "nrarfcn": "NR-ARFCN",
    # セキュリティ / 鍵 / 認証
    "aka": "AKA", "eap": "EAP", "tls": "TLS", "kasme": "KASME",
    "kamf": "KAMF", "kenb": "KeNB", "kgnb": "KgNB", "knas": "KNAS",
    "knasenc": "KNASenc", "knasint": "KNASint", "krrcenc": "KRRCenc",
    "krrcint": "KRRCint", "kupenc": "KUPenc",
    # スライシング / 仮想化 / MEC / クラウド
    "snssai": "S-NSSAI", "sst": "SST", "nsi": "NSI", "mec": "MEC",
    "nfv": "NFV", "sdn": "SDN", "vnf": "VNF", "cnf": "CNF",
    # V2X / NTN / サイドリンク
    "v2x": "V2X", "ltev2x": "LTE-V2X", "nrv2x": "NR-V2X",
    "sidelink": "Sidelink", "pc5": "PC5", "ntn": "NTN",
    # 開発 / API / 一般IT
    "api": "API", "sdk": "SDK", "cli": "CLI", "gui": "GUI", "json": "JSON",
    "xml": "XML", "yaml": "YAML", "http": "HTTP", "https": "HTTPS",
    "rest": "REST", "grpc": "gRPC", "websocket": "WebSocket", "sql": "SQL",
    "nosql": "NoSQL", "uuid": "UUID", "jwt": "JWT", "oauth": "OAuth",
    "oauth2": "OAuth 2.0", "openid": "OpenID",
    "openidconnect": "OpenID Connect",
}

# textUtilsConvertForCau.js:1070-1096 — boundary-required short tokens.
CONDITIONAL_SHORT_MAP = {
    "tr": "TR", "ts": "TS", "ip": "IP", "ho": "HO", "ra": "RA",
    "du": "DU", "cu": "CU", "ue": "UE", "ca": "CA", "dc": "DC",
    "rv": "RV", "ri": "RI", "li": "LI", "ta": "TA",
    "af": "AF", "dn": "DN", "ck": "CK", "ik": "IK", "sd": "SD",
    "ui": "UI", "ux": "UX",
}

# textUtilsConvertForCau.js:1102
BOUNDARY_SENSITIVE_KEYS = {"nr"}

_NORM_DROP = re.compile(r"[\s\-_]")
_SEP_CHARS = frozenset(" \t\n\r-_")


def _normalize(s: str) -> str:
    return _NORM_DROP.sub("", s).lower()


class _Entry:
    __slots__ = ("value", "boundary_sensitive", "conditional_short")

    def __init__(self, value: str, boundary_sensitive: bool, conditional_short: bool):
        self.value = value
        self.boundary_sensitive = boundary_sensitive
        self.conditional_short = conditional_short


def _build_trie() -> dict:
    entry_map: dict[str, _Entry] = {}

    def put(raw_key: str, value: str, boundary: bool, cond: bool) -> None:
        nk = _normalize(raw_key)
        if not nk:
            return
        if nk in entry_map:
            raise ValueError(f"normalized key collision: {raw_key!r} ({nk})")
        entry_map[nk] = _Entry(value, boundary, cond)

    for k, v in REPLACE_MAP.items():
        put(k, v, _normalize(k) in BOUNDARY_SENSITIVE_KEYS, False)
    for k, v in CONDITIONAL_SHORT_MAP.items():
        put(k, v, True, True)

    root: dict = {}
    for nk, entry in entry_map.items():
        node = root
        for ch in nk:
            node = node.setdefault(ch, {})
        node["\0"] = entry  # terminal marker
    return root


_TRIE = _build_trie()

_ASCII_WORD = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
)

_CHUNK_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9\s_-]*")


def _has_boundary(chunk: str, start: int, end_excl: int) -> bool:
    prev = chunk[start - 1] if start > 0 else ""
    nxt = chunk[end_excl] if end_excl < len(chunk) else ""
    return prev not in _ASCII_WORD and nxt not in _ASCII_WORD


def _replace_chunk_impl(chunk: str) -> str:
    """textUtilsConvertForCau.js:1222-1273 — longest-match left-to-right.

    Unmatched regions are copied only at match boundaries (one slice per
    match instead of one per character — the output is the chunk with
    matched spans substituted either way)."""
    norm_chars: list[str] = []
    norm_to_orig: list[int] = []
    for i, c in enumerate(chunk):
        if c in _SEP_CHARS:
            continue
        norm_chars.append(c.lower())
        norm_to_orig.append(i)
    if not norm_chars:
        return chunk
    norm = "".join(norm_chars)
    n = len(norm)

    out: list[str] = []
    orig_cursor = 0
    i = 0
    trie_get = _TRIE.get
    while i < n:
        # findLongestApplicableMatch
        node = trie_get(norm[i])
        if node is None:
            i += 1
            continue
        best_value = None
        best_end = -1
        j = i
        while node is not None:
            entry = node.get("\0")
            if entry is not None:
                end = j + 1
                start_orig = norm_to_orig[i]
                end_orig_excl = norm_to_orig[end - 1] + 1
                ok = True
                if entry.boundary_sensitive and not _has_boundary(chunk, start_orig, end_orig_excl):
                    ok = False
                if ok and entry.conditional_short:
                    raw_span = chunk[start_orig:end_orig_excl]
                    if any(c in _SEP_CHARS for c in raw_span):
                        ok = False
                if ok:
                    best_value = entry.value
                    best_end = end
            j += 1
            if j >= n:
                break
            node = node.get(norm[j])

        if best_value is None:
            i += 1
            continue

        start_orig = norm_to_orig[i]
        end_orig_excl = norm_to_orig[best_end - 1] + 1
        if orig_cursor < start_orig:
            out.append(chunk[orig_cursor:start_orig])
        out.append(best_value)
        orig_cursor = end_orig_excl
        i = best_end

    if not out:
        return chunk
    if orig_cursor < len(chunk):
        out.append(chunk[orig_cursor:])
    return "".join(out)


# Chunks repeat heavily in real corpora (fixed phrases, citations, DB
# names) and _replace_chunk is a pure function — cache the small ones.
# Megadoc-sized chunks bypass the cache (memory per worker).
_replace_chunk_cached = functools.lru_cache(maxsize=32768)(_replace_chunk_impl)


def _replace_chunk(chunk: str) -> str:
    if len(chunk) <= 256:
        return _replace_chunk_cached(chunk)
    return _replace_chunk_impl(chunk)


def apply_flexible_map(s: str) -> str:
    """textUtilsConvertForCau.js:576-1280.

    Applied twice per officeAction document (start of 'main', end of
    'convertEnd' — reference-faithful order).  The second pass cannot be
    doc-level-memoized: pad_head and the law-number cascades change the
    text in between (measured hit rate 0.0 on both the EN synthetic and
    JP fixture corpora).  The mitigation that DOES hold is the chunk-level
    lru below — JP text yields short, highly-repetitive ASCII chunks that
    hit across passes and across documents; all-ASCII documents degenerate
    to one whole-doc chunk and pay the full linear rescan (~35% of
    conversion cost on the synthetic corpus, see PLANS.md)."""
    return _CHUNK_RE.sub(lambda m: _replace_chunk(m.group(0)), str(s))
