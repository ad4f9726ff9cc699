"""SymSpell-style spelling correction — deterministic stand-in.

Reference: SpellingCorrectionRefiner (general_text/refine/
spelling_correction_refiner.py:86-94) runs symspellpy ``lookup(word,
Verbosity.CLOSEST, max_edit_distance)`` per whitespace token against the
82k-word frequency dictionary it downloads at runtime. Neither symspellpy
nor the network is available here, so this module pins:

* a small frequency dictionary (common English words, descending counts —
  the correction TARGETS; anything else passes through untouched);
* the symspell algorithm itself: a deletes-index (every ≤d-char-deletion
  of a dictionary word maps back to it), candidate lookup through the
  query's own deletes, optimal-string-alignment distance verify, and
  CLOSEST ranking (min distance, then max frequency, then lexicographic).

Only lowercase alphabetic tokens of length >= 3 are corrected (case and
punctuation handling would need the full symspell transfer-casing
machinery); everything else is returned verbatim.
"""

from __future__ import annotations

from functools import lru_cache

# pinned frequency dictionary: (word, count) — descending-frequency subset
# of an English corpus wordlist, large enough to exercise the algorithm
_DICTIONARY: list[tuple[str, int]] = [
    ("the", 23135851162), ("of", 13151942776), ("and", 12997637966),
    ("to", 12136980858), ("a", 9081174698), ("in", 8469404971),
    ("for", 5933321709), ("is", 4705743816), ("on", 3750423199),
    ("that", 3400031103), ("by", 3350048871), ("this", 3228469771),
    ("with", 3183110675), ("you", 2996181025), ("it", 2813772954),
    ("not", 2633487141), ("or", 2590739907), ("be", 2398724162),
    ("are", 2393614870), ("from", 2275595356), ("at", 2272272772),
    ("as", 2247431740), ("your", 1620409751), ("all", 1564202750),
    ("have", 1435347596), ("new", 1369376198), ("more", 1366436196),
    ("an", 1346230970), ("was", 1300031298), ("we", 1262007954),
    ("will", 1239633554), ("home", 1115001320), ("can", 1075265722),
    ("us", 1058120719), ("about", 1045226127), ("if", 985888485),
    ("page", 969026743), ("my", 919821386), ("has", 885154788),
    ("search", 866829237), ("free", 847825364), ("but", 832705507),
    ("our", 821938621), ("one", 812009129), ("other", 805170737),
    ("do", 778590320), ("no", 742766383), ("information", 739968013),
    ("time", 731955052), ("they", 725740849), ("site", 703918460),
    ("he", 699026818), ("up", 692948555), ("may", 686184376),
    ("what", 671294717), ("which", 659623222), ("their", 636999752),
    ("news", 618284609), ("out", 611389033), ("use", 604986717),
    ("any", 601680046), ("there", 596789119), ("see", 591771059),
    ("only", 585579790), ("so", 578017013), ("his", 571244312),
    ("when", 565034929), ("contact", 563774553), ("here", 558623416),
    ("business", 543979724), ("who", 535631835), ("web", 531661867),
    ("also", 524505952), ("now", 518854464), ("help", 513311693),
    ("get", 508427499), ("view", 500686585), ("online", 497222547),
    ("first", 473789154), ("been", 466426655), ("would", 456413768),
    ("how", 453204737), ("were", 449870919), ("me", 437976283),
    ("some", 428754283), ("these", 425775708), ("its", 416213395),
    ("like", 405163079), ("service", 403797340), ("than", 395503025),
    ("find", 394967626), ("price", 392414963), ("date", 390313531),
    ("back", 387560433), ("top", 383813522), ("people", 381842625),
    ("had", 379371529), ("list", 378131977), ("name", 377272958),
    ("just", 371025706), ("over", 369370224), ("state", 364595989),
    ("year", 363842330), ("day", 359481485), ("into", 358087392),
    ("email", 353331805), ("two", 352587789), ("health", 351684015),
    ("world", 351242533), ("re", 349973551), ("next", 346029944),
    ("used", 346006734), ("go", 344614515), ("work", 342409139),
    ("last", 338213414), ("most", 337418724), ("products", 336424832),
    ("music", 335110885), ("buy", 331744559), ("data", 328814544),
    ("make", 328551945), ("them", 326649645), ("should", 326350429),
    ("product", 324241131), ("system", 323551973), ("post", 323352584),
    ("her", 322751646), ("city", 319945856), ("add", 316971355),
    ("policy", 316493778), ("number", 315869187), ("such", 315561502),
    ("please", 313486219), ("available", 312713467), ("copyright", 311904398),
    ("support", 310101206), ("message", 305362414), ("after", 304059171),
    ("best", 303316756), ("software", 302651563), ("then", 301239976),
    ("good", 295835222), ("video", 293692315), ("well", 291748974),
    ("where", 288211809), ("info", 287048625), ("rights", 285952154),
    ("public", 285395154), ("books", 284931465), ("high", 282221269),
    ("school", 281811257), ("through", 280089459), ("each", 277933853),
    ("links", 277548745), ("she", 276112372), ("review", 274088977),
    ("years", 272340346), ("order", 269304807), ("very", 266569690),
    ("privacy", 266094506), ("book", 265468095), ("items", 264607771),
    ("company", 261986005), ("read", 261389019), ("group", 260628981),
    ("need", 260196616), ("many", 257855272), ("user", 256114637),
    ("said", 254455952), ("does", 252395162), ("set", 251688965),
    ("under", 250949266), ("general", 249846129), ("research", 247377787),
    ("university", 245029095), ("january", 244551096), ("mail", 244089046),
    ("full", 243306519), ("map", 242734365), ("reviews", 241225861),
    ("program", 240425386), ("life", 238246601), ("know", 235294233),
    ("games", 234600704), ("way", 234214887), ("days", 233554993),
    ("management", 231852260), ("part", 231419395), ("could", 230734269),
    ("great", 230318436), ("united", 229549355), ("hotel", 228850910),
    ("real", 228479147), ("item", 227846790), ("international", 226906536),
    ("center", 226528149), ("ebay", 225782043), ("must", 225279495),
    ("store", 224771208), ("travel", 224597689), ("comments", 224285562),
    ("made", 223889833), ("development", 223276838), ("report", 222970540),
    ("off", 222872261), ("member", 221824107), ("details", 221624462),
    ("line", 221391651), ("terms", 220793948), ("before", 220760335),
    ("hotels", 219906407), ("did", 219279262), ("send", 218577503),
    ("right", 217778034), ("type", 217274358), ("because", 216647926),
    ("local", 215297370), ("those", 215023191), ("using", 214798604),
    ("results", 214752415), ("office", 213767195), ("education", 212993391),
    ("national", 211373457), ("car", 210808318), ("design", 210695720),
    ("take", 210508657), ("posted", 209851282), ("internet", 209572711),
    ("address", 209498303), ("community", 209084577), ("within", 208601078),
    ("states", 207571449), ("area", 207487476), ("want", 206986656),
    ("phone", 206686301), ("shipping", 206545642), ("reserved", 206065906),
    ("subject", 205693026), ("between", 205393473), ("forum", 204946168),
    ("family", 204750948), ("long", 204059341), ("based", 203831381),
    ("code", 203477203), ("show", 202957592), ("even", 202316586),
    ("black", 201963054), ("check", 201092565), ("special", 200748169),
    ("prices", 200522663), ("website", 200169977), ("index", 199729176),
    ("being", 199093631), ("women", 198525738), ("much", 198341167),
    ("sign", 198057319), ("file", 197343523), ("link", 196498904),
    ("open", 196153640), ("today", 195574066), ("technology", 195126072),
    ("south", 194928682), ("case", 194550260), ("project", 194264190),
    ("same", 193953223), ("pages", 193853026), ("version", 192562737),
    ("section", 192200724), ("own", 192075037), ("found", 191862254),
    ("sports", 191556554), ("house", 191432242), ("related", 191014948),
    ("security", 190507651), ("both", 190026520), ("county", 189948179),
    ("american", 189885677), ("photo", 189529587), ("game", 189444842),
    ("members", 189285226), ("power", 189239202), ("while", 188531154),
    ("care", 188180729), ("network", 187939536), ("down", 187593820),
    ("computer", 187308421), ("systems", 187251386), ("three", 186347666),
    ("total", 185375750), ("place", 185087495), ("end", 184810939),
    ("following", 184701027), ("download", 184234556), ("him", 183912305),
    ("without", 183604779), ("per", 183087711), ("access", 182775980),
    ("think", 182622164), ("north", 182288534), ("resources", 181996861),
    ("current", 181613655), ("posts", 181586296), ("big", 181250934),
    ("media", 180735302), ("law", 180252165), ("control", 179912224),
    ("water", 179717197), ("history", 179425520), ("pictures", 179231403),
    ("size", 178981267), ("art", 178640557), ("personal", 178353777),
    ("since", 178263493), ("including", 178151933), ("guide", 177772346),
    ("shop", 177599633), ("directory", 177161934), ("board", 176982058),
    ("location", 176749601), ("change", 176731862), ("white", 176353173),
    ("text", 176281464), ("small", 175380334), ("rating", 174999624),
    ("rate", 174898964), ("government", 174481920), ("children", 174110992),
]


def _deletes(word: str, d: int) -> set[str]:
    """All strings reachable from ``word`` by deleting up to ``d`` chars."""
    out = {word}
    frontier = {word}
    for _ in range(d):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1 :])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def _osa_distance(a: str, b: str, cap: int) -> int:
    """Optimal string alignment (restricted Damerau-Levenshtein) with cap."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
        if min(prev) > cap:
            return cap + 1
    return prev[lb]


class SymSpell:
    """Deletes-index spelling corrector (pinned dictionary)."""

    def __init__(self, max_edit_distance: int = 2, dictionary=None):
        self.d = max_edit_distance
        self.freq: dict[str, int] = dict(dictionary or _DICTIONARY)
        self.index: dict[str, list[str]] = {}
        for w in self.freq:
            for dele in _deletes(w, self.d):
                self.index.setdefault(dele, []).append(w)

    @lru_cache(maxsize=65536)
    def correct(self, word: str) -> str:
        """CLOSEST-verbosity lookup: best (distance, -freq, term) candidate
        within max_edit_distance, else the word unchanged."""
        if word in self.freq:
            return word
        cands: set[str] = set()
        for dele in _deletes(word, self.d):
            cands.update(self.index.get(dele, ()))
        best: tuple[int, int, str] | None = None
        for c in cands:
            dist = _osa_distance(word, c, self.d)
            if dist > self.d:
                continue
            key = (dist, -self.freq[c], c)
            if best is None or key < best:
                best = key
        return best[2] if best else word


_DEFAULT: SymSpell | None = None


def default_symspell() -> SymSpell:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = SymSpell()
    return _DEFAULT


def correct_text(text: str, sym: SymSpell | None = None) -> str:
    """Reference spelling_checks shape (spelling_correction_refiner.py:86-93):
    correct each whitespace token, single-space rejoin. Only lowercase
    alphabetic tokens of length >= 3 are candidates."""
    sym = sym or default_symspell()
    out = []
    for w in text.split():
        if len(w) >= 3 and w.isalpha() and w.islower():
            out.append(sym.correct(w))
        else:
            out.append(w)
    return " ".join(out)
