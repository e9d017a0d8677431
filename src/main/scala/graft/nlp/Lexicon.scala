package graft.nlp

/** Closed-class lexicons + lemmatizer for the deterministic rule NLP kernel
  * (SURVEY.md U1 "v1 deterministic rule lexicon NER"). All data below is
  * original (capability-equivalent to the reference's verb lexicons,
  * poligrapher/verb_patterns.yml:1-79, and NER seed lists,
  * models/named-entity-recognition/gen_ner_data.py:16-34).
  */
object Lexicon {

  /** Verb lexicons consumed by the collection pattern DSL (token_map) —
    * loaded from the graft/verb_patterns.yml resource so the dictionary
    * stays data. */
  val tokenMap: Map[String, Set[String]] = VerbPatternsYaml.tokenMap

  /** Every lemma any pattern can anchor on, plus common policy verbs that
    * appear in purpose clauses — drives VERB tagging. Noun-class token maps
    * (STORE_NOUN destinations) are excluded: "mailing list" must not gain a
    * verb reading because "list" is a store noun. */
  val verbLemmas: Set[String] = tokenMap.collect {
    case (name, lemmas) if !name.endsWith("_NOUN") => lemmas
  }.flatten.toSet ++ Set(
    "include", "improve", "personalize", "deliver", "help", "protect",
    "comply", "measure", "send", "contact", "operate", "detect", "prevent",
    "identify", "link", "combine", "serve", "target", "track", "monitor",
    "verify", "administer", "manage", "fulfill", "respond", "enhance",
    "customize", "understand", "communicate", "secure", "inform", "notify",
    "make", "gain", "ensure", "offer", "show", "display", "enforce",
    // pattern-root / xcomp lemmas outside the token map — without these the
    // tagger reads them as nouns and the pattern never anchors
    "set", "place", "associate", "merge", "consent", "agree", "confirm",
    // user-activity verbs inside relative clauses ("pages you visit",
    // "products you purchased") — drive annotateActivityRelcl
    "visit", "view", "browse", "purchase", "buy", "run", "occur", "pair",
    "apply", "enter",
    "build", "create", "compile", "generate", "capture", "remember",
    "rely", "fall", "resort", "depend", "decline", "mean", "determine",
    "persist", "contain", "leave", "stream", "append", "archive", "write",
    "note", "export", "convey", "feed", "know", "learn", "photograph",
    "invite", "open", "take", "acknowledge", "admit", "deny", "gather",
    "inspect", "survive", "accompany", "bear", "hear", "prefer", "file",
    "round", "cease", "stay", "type", "remain", "embed", "bill", "go",
    "freeze", "watermark", "load", "download", "become", "suspect", "attempt",
    // prohibition verbs: without a VERB reading they become opaque non-party
    // subjects and trigger the implicit-operator path (round-4 ADVICE)
    "prohibit", "forbid",
    // batch-9 figurative ingress/retention/acquisition members — pattern
    // roots outside the token map need the VERB reading to anchor
    "reach", "land", "stick", "linger", "treat", "inform", "find", "pay",
    "fingerprint",
    // batch-10 closure: figurative ingress/retention/acquisition members
    "end", "hang", "slip", "settle", "lodge", "ride", "tag", "escape",
    "sign", "trickle", "feast", "catch", "steal", "flow",
    // batch-11 closure: accumulation/residence/consumption/conduit roots
    // outside the token maps, plus "tape" for the recording capture-term
    "pile", "wash", "accumulate", "live", "reside", "sit", "nibble",
    "graze", "snack", "piggyback", "hitchhike", "expire", "rotate", "tape",
    // batch-12 closure: egress/residence/deposit pattern roots outside the
    // token maps ("would vanish from our ledgers", "hibernate in our
    // backup vault", "would have been scrubbed from our rolls")
    "vanish", "evaporate", "scrub", "hibernate", "weave",
    // batch-13 closure: residence/egress pattern roots outside the token
    // maps ("camp out in our diagnostics pool", "marinate in our perks
    // engine", "would have melted away from our shelves"), plus overhear
    // for the device-capture free relative and wind for "wind up V-ed"
    "camp", "marinate", "languish", "stow", "melt", "fish", "dip",
    "overhear", "wind",
    // subordinate-clause verbs that otherwise noun-tag and leak into the
    // matrix clause's subject list ("Had the auditor not objected, ...")
    "object",
    // batch-14 closure: ingestion/deposit/conduit/residence/extraction
    // roots outside the token maps, plus denominal verbs that otherwise
    // noun-tag ("trucks chargeback records", "pockets the scroll path",
    // "is inventoried by our accessory scanner")
    "devour", "mop", "guzzle", "truck", "freight", "parachute",
    "inventory", "bottle", "pocket", "memorialize", "nest", "roost",
    "fade", "raid",
    // batch-15 closure: deposit/residence/conduit/extraction roots and
    // denominal verbs outside the token maps ("banked in our attention
    // vault", "winter in our ergonomics cellar", "tap our bid stream",
    // "carries home", "Into our tally book tumble ...")
    "bank", "winter", "bunk", "airlift", "tap", "hoard", "tumble",
    "glimpse", "carry", "balloon", "swell", "bulge", "swarm", "teem",
    "brim",
    // batch-16 closure: ingestion/deposit/residence/conduit/extraction
    // roots and denominal verbs outside the token maps
    "plunder", "hole", "square", "tally", "perch", "scoop", "rifle",
    "spirit", "dodge", "shelter", "seep", "hop", "moonlight",
    // batch-17 closure roots
    "sponge", "chronicle", "ship", "loot", "idle", "lurk", "doze",
    "slumber", "lob", "teleport", "scavenge", "corral", "surrender",
    "relinquish",
    // batch-18 closure roots
    "gulp", "pilfer", "bed", "catapult", "pour", "sight", "overwinter",
    "chisel", "shake", "chauffeur", "nestle", "wing", "lounge",
    "hunker", "bypass",
    // batch-19 closure roots
    "summer", "loiter", "comb", "rocket", "sock", "fax", "dredge",
    "strip-mine", "deposit", "look", "bivouac",
    // batch-20 closure roots: extraction (trawl/prospect ... for),
    // residence (holiday/nap/curl ... in), store-subject accumulation
    // (hums with), conduits (shunt, dash ... off to), deposit
    // (tabulate/notate), ingestion (sop up)
    "trawl", "prospect", "holiday", "nap", "curl", "hum", "shunt",
    "dash", "tabulate", "notate", "sop",
    // batch-23/24 closure roots: residence (squat/den), accumulation
    // (groan/bristle with), extraction (pan/winnow ... for)
    "squat", "den", "groan", "bristle", "pan", "winnow")

  val pronouns: Set[String] = Set("we", "us", "you", "i", "me", "they",
    "them", "it", "he", "she", "this", "that", "these", "those", "who",
    "there")
  val determiners: Set[String] = Set("the", "a", "an", "your", "our",
    "their", "its", "my", "his", "her", "any", "some", "all", "each",
    "certain", "various", "such", "no", "other", "additional", "more",
    "every")
  val auxiliaries: Set[String] = Set("may", "might", "can", "could", "will",
    "would", "shall", "should", "must", "do", "does", "did", "is", "are",
    "was", "were", "be", "been", "being", "am", "has", "have", "had",
    // contraction stems left of a split "n't" (won't → wo + n't)
    "wo", "ca", "sha", "ai", "don", "doesn", "didn", "isn", "aren", "wasn",
    "weren", "hasn", "haven", "hadn", "couldn", "wouldn", "shouldn", "mustn")
  val adpositions: Set[String] = Set("with", "from", "to", "for", "of",
    "about", "by", "in", "on", "at", "as", "regarding", "through", "via",
    "into", "without", "within", "during", "under", "between", "like",
    "including", "across", "after", "before", "against", "upon", "outside",
    "besides", "except", "excluding", "alongside", "notwithstanding")
  val coordConj: Set[String] = Set("and", "or", "but", "nor", "plus")
  val subordConj: Set[String] = Set("if", "when", "because", "while",
    "that", "which", "whether", "unless", "whenever", "wherever", "whereby",
    "wherein", "once", "although", "though", "since", "than")
  val negations: Set[String] = Set("not", "never", "n't", "neither")
  val adverbs: Set[String] = Set("also", "only", "below", "above", "however",
    "moreover", "additionally", "further", "especially", "particularly",
    "namely", "together", "sometimes", "always", "so", "back", "otherwise",
    "along", "up", "off", "away", "down", "still", "out", "overnight",
    "forever")
  val adjectives: Set[String] = Set("personal", "precise", "third", "first",
    "unique", "demographic", "financial", "technical", "aggregated",
    "anonymous", "following", "certain", "various", "other", "similar",
    "necessary", "such", "sensitive", "non-personal", "new", "relevant",
    "applicable", "general", "specific", "own", "online", "reachable",
    "located", "based",
    "parental", "explicit", "prior", "written", "valid", "visible",
    "accessible", "available")
  val stopWords: Set[String] = Set("the", "a", "an", "of", "to", "and",
    "or", "for", "in", "on", "at", "by", "with", "from", "about", "as",
    "is", "are", "be", "we", "you", "our", "your", "their", "this", "that",
    "these", "those", "it", "they", "them", "us", "may", "can", "will",
    "such", "any", "some", "all", "other", "do", "does", "not", "have",
    "has", "its", "my", "me", "i", "he", "she", "but", "if", "so", "than",
    "then", "when", "which", "who", "whom", "what", "how", "why", "where")

  /** Irregular lemma exceptions (inflected → lemma). */
  private val lemmaExceptions: Map[String, String] = Map(
    "is" -> "be", "are" -> "be", "was" -> "be", "were" -> "be",
    "been" -> "be", "being" -> "be", "am" -> "be",
    "has" -> "have", "had" -> "have", "having" -> "have",
    "does" -> "do", "did" -> "do", "done" -> "do",
    "children" -> "child", "kept" -> "keep", "held" -> "hold",
    "sold" -> "sell", "given" -> "give", "gave" -> "give",
    "got" -> "get", "gotten" -> "get", "made" -> "make", "sent" -> "send",
    "frozen" -> "freeze", "froze" -> "freeze",
    "used" -> "use", "seen" -> "see", "saw" -> "see", "taken" -> "take",
    "took" -> "take", "known" -> "know", "knew" -> "know",
    "written" -> "write", "wrote" -> "write",
    "parties" -> "party", "companies" -> "company", "policies" -> "policy",
    "cookies" -> "cookie", "technologies" -> "technology",
    "identities" -> "identity", "activities" -> "activity",
    "addresses" -> "address", "purposes" -> "purpose", "uses" -> "use",
    "data" -> "data", "media" -> "media", "analytics" -> "analytics",
    "services" -> "service", "e.g." -> "e.g.", "i.e." -> "i.e.",
    "an" -> "a", "ads" -> "ad", "apis" -> "api", "ids" -> "id",
    "statuses" -> "status", "processes" -> "process", "gps" -> "gps",
    "sms" -> "sms", "ios" -> "ios", "access" -> "access", "less" -> "less",
    "unless" -> "unless", "business" -> "business", "address" -> "address",
    "as" -> "as", "this" -> "this", "us" -> "us", "is" -> "be",
    "devices" -> "device", "preferences" -> "preference",
    "pages" -> "page", "messages" -> "message", "images" -> "image",
    "times" -> "time", "types" -> "type", "names" -> "name",
    "practices" -> "practice", "sources" -> "source", "stores" -> "store",
    "features" -> "feature", "profiles" -> "profile", "files" -> "file",
    // British doubled-l past forms escape the ll de-doubling exemption
    "pencilled" -> "pencil", "pencilling" -> "pencil",
    "chiselled" -> "chisel", "chiselling" -> "chisel",
    // irregular participles ("woven into the fit profile we keep",
    // "is swept up by our fleet monitor")
    "woven" -> "weave", "swept" -> "sweep", "goes" -> "go",
    // British -ue spellings resolve to the American token-map lemma
    // ("is catalogued" must anchor the VERB_STORE root "catalog")
    "catalogue" -> "catalog", "catalogues" -> "catalog",
    "catalogued" -> "catalog", "cataloguing" -> "catalog",
    // reflexive pronouns must keep their -s (the "help themselves to"
    // pattern anchors on the lemma; the de-s rule mangled it to
    // "themselve" and the pattern was dead until batch 14)
    "themselves" -> "themselves", "ourselves" -> "ourselves")

  /** Bases known to end in -e so -ed/-ing strip restores the e. */
  private val eRestore: Set[String] = Set("include", "use", "store", "share", "provide",
    "receive", "release", "exchange", "disclose", "lease", "acquire",
    "oblige", "enable", "authorize", "continue", "combine", "serve",
    "measure", "personalize", "improve", "customize", "analyze", "utilize",
    "save", "preserve", "require", "ensure", "secure", "enhance", "manage",
    "delete", "update", "give", "make", "notice", "purchase", "device",
    "operate", "administer", "handle", "merge", "infer", "derive",
    "place", "create", "erase", "generate", "aggregate", "associate", "exclude",
    "compile", "change", "observe", "archive", "profile", "trace", "cease",
    "arrive", "type", "stay", "purge", "freeze",
    "tape", "live", "reside", "rotate", "graze", "pile", "shelve",
    "file", "browse", "weave", "hibernate", "evaporate",
    "pigeonhole", "marinate", "cable", "escape",
    "bottle", "memorialize", "guzzle", "fade", "lodge", "devour",
    "glimpse", "tumble", "square", "rifle", "dodge",
    "sponge", "chronicle", "idle", "doze", "scavenge",
    "nestle", "lounge",
    // batch-20 closure: "tabulated", "notated"
    "tabulate", "notate",
    // batch-23 closure: "minuted in our perks docket"
    "minute",
    // batch-24 closure: "is noted in our compatibility ledger" had
    // lemmatized to the negation "not"
    "note")

  /** Memoized lemma lookup — the suffix rules below allocate several interim
    * strings per call and words repeat massively across documents, so a
    * bounded shared cache removes most of the kernel's lemmatizer
    * allocation (executor-wide, like the broadcast dictionaries). */
  private val lemmaCache = new java.util.concurrent.ConcurrentHashMap[String, String](1 << 16)

  /** Lowercase memo: ancestor segments re-tag in every descendant context
    * doc, so the same surface tokens lowercase thousands of times — cache
    * the result (bounded, executor-wide, like the lemma cache). */
  private val lowerCache = new java.util.concurrent.ConcurrentHashMap[String, String](1 << 16)

  def lower(word: String): String = {
    val cached = lowerCache.get(word)
    if (cached != null) cached
    else {
      val l = word.toLowerCase
      if (lowerCache.size < 200000) lowerCache.put(word, l)
      l
    }
  }

  /** Allocation-free "is already all-lowercase" (the tagger's common case
    * guard `t.text == t.text.toLowerCase` built a copy per call). */
  def isLower(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) != Character.toLowerCase(s.charAt(i))) return false
      i += 1
    }
    true
  }

  /** Allocation-free case-insensitive suffix check. */
  def endsWithIgnoreCase(s: String, suffix: String): Boolean = {
    val off = s.length - suffix.length
    off >= 0 && s.regionMatches(true, off, suffix, 0, suffix.length)
  }

  def lemma(word: String): String = {
    val cached = lemmaCache.get(word)
    if (cached != null) cached
    else {
      val l = computeLemma(word)
      if (lemmaCache.size < 200000) lemmaCache.put(word, l)
      l
    }
  }

  private def computeLemma(word: String): String = {
    val w0 = word.toLowerCase
    // Saxon genitive stays attached by the tokenizer ("courier's roster")
    // — strip it so the possessor keeps its dictionary identity
    val w =
      if (w0.endsWith("'s") || w0.endsWith("’s")) w0.dropRight(2)
      else if (w0.length > 2 && (w0.endsWith("'") || w0.endsWith("’")) &&
        w0.charAt(w0.length - 2) == 's') w0.dropRight(1)
      else w0
    lemmaExceptions.get(w) match {
      case Some(l) => l
      case None =>
        if (w.length <= 3) w
        else if (w.endsWith("ies") && w.length > 4) w.dropRight(3) + "y"
        else if (w.endsWith("sses") || w.endsWith("shes") || w.endsWith("ches") || w.endsWith("xes"))
          w.dropRight(2)
        else if (w.endsWith("ied") && w.length > 4) w.dropRight(3) + "y"
        else if (w.endsWith("ing") && w.length > 5) {
          val base = w.dropRight(3)
          if (eRestore.contains(base + "e")) base + "e"
          else if (base.length > 2 && base(base.length - 1) == base(base.length - 2) &&
            !base.endsWith("ss") && !base.endsWith("ll")) base.dropRight(1)
          else base
        } else if (w.endsWith("ed") && w.length > 4 &&
          // -eed words are not past forms (speed, need, feed, proceed) —
          // stripping gave lemma "spe" and broke the lemma-key index for
          // "typing speed" (batch 18)
          !w.endsWith("eed")) {
          val base = w.dropRight(2)
          if (eRestore.contains(base + "e")) base + "e"
          else if (base.length > 2 && base(base.length - 1) == base(base.length - 2) &&
            !base.endsWith("ss") && !base.endsWith("ll")) base.dropRight(1)
          else base
        } else if (w.endsWith("s") && !w.endsWith("ss") &&
          (!w.endsWith("us") || w.endsWith("eaus")) && !w.endsWith("is")) {
          // -eaus plurals (bureaus, plateaus) strip normally; other -us
          // words (bonus, status) are singular
          w.dropRight(1)
        } else w
    }
  }

  /** Multi-word DATA phrases for dictionary NER (longest match wins) —
    * loaded from the graft/phrase_map.yml resource. */
  val dataPhrases: Set[Vector[String]] = PhraseMapYaml.loaded.dataPhrases

  /** Multi-word ACTOR phrases for dictionary NER (phrase_map.yml). */
  val actorPhrases: Set[Vector[String]] = PhraseMapYaml.loaded.actorPhrases

  /** Known company entities with aliases + registered domains — a tiny
    * in-repo analogue of the reference's entity_info.json
    * (graph_utils.py:43-73); used by entity normalization + domain joins. */
  val entityInfo: Map[String, (Set[String], Set[String])] = PhraseMapYaml.loaded.entityInfo

  /** Purpose keyword model (v1 deterministic stand-in for the reference's
    * SetFit classifier, purpose_classification.py:5-24). Multi-label. */
  val purposeKeywords: Map[String, Set[String]] = Map(
    "advertising" -> Set("advertising", "advertisement", "ad", "ads",
      "marketing", "promotional", "promotion", "promote", "campaign",
      "advertise", "interest-based", "retargeting", "remarketing"),
    "analytics" -> Set("analytics", "analyze", "analysis", "measure",
      "measurement", "statistic", "statistical", "trend", "usage",
      "research", "understand", "metric", "performance"),
    "legal" -> Set("legal", "law", "laws", "comply", "compliance",
      "obligation", "regulation", "regulatory", "court", "enforce",
      "enforcement", "dispute", "right", "lawful"),
    "security" -> Set("security", "secure", "fraud", "protect",
      "protection", "safety", "abuse", "unauthorized", "verify",
      "verification", "authenticate", "authentication", "detect",
      "prevent", "risk"),
    "services" -> Set("service", "services", "functionality", "feature",
      "improve", "improvement", "personalize", "personalization",
      "customize", "deliver", "provide", "operate", "maintain", "support",
      "experience", "account", "order", "transaction", "request",
      "communicate", "respond", "contact", "notification"))
}
