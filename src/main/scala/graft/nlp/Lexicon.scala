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
    * appear in purpose clauses — drives VERB tagging. */
  val verbLemmas: Set[String] = tokenMap.values.flatten.toSet ++ Set(
    "include", "improve", "personalize", "deliver", "help", "protect",
    "comply", "measure", "send", "contact", "operate", "detect", "prevent",
    "identify", "link", "combine", "serve", "target", "track", "monitor",
    "verify", "administer", "manage", "fulfill", "respond", "enhance",
    "customize", "understand", "communicate", "secure", "inform", "notify",
    "make", "gain", "ensure", "offer", "show", "display", "enforce")

  val pronouns: Set[String] = Set("we", "us", "you", "i", "me", "they",
    "them", "it", "he", "she", "this", "that", "these", "those", "who")
  val determiners: Set[String] = Set("the", "a", "an", "your", "our",
    "their", "its", "my", "his", "her", "any", "some", "all", "each",
    "certain", "various", "such", "no", "other", "additional", "more")
  val auxiliaries: Set[String] = Set("may", "might", "can", "could", "will",
    "would", "shall", "should", "must", "do", "does", "did", "is", "are",
    "was", "were", "be", "been", "being", "am", "has", "have", "had")
  val adpositions: Set[String] = Set("with", "from", "to", "for", "of",
    "about", "by", "in", "on", "at", "as", "regarding", "through", "via",
    "into", "without", "within", "during", "under", "between", "like",
    "including", "across", "after", "before")
  val coordConj: Set[String] = Set("and", "or", "but", "nor")
  val subordConj: Set[String] = Set("if", "when", "because", "while",
    "that", "which", "whether", "unless")
  val negations: Set[String] = Set("not", "never", "n't", "neither")
  val adverbs: Set[String] = Set("also", "only", "below", "above", "however",
    "moreover", "additionally", "further", "especially", "particularly",
    "namely", "together", "sometimes", "always", "so")
  val adjectives: Set[String] = Set("personal", "precise", "third", "first",
    "unique", "demographic", "financial", "technical", "aggregated",
    "anonymous", "following", "certain", "various", "other", "similar",
    "necessary", "such", "sensitive", "non-personal", "new", "relevant",
    "applicable", "general", "specific", "own", "online")
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
    "features" -> "feature", "profiles" -> "profile", "files" -> "file")

  /** Bases known to end in -e so -ed/-ing strip restores the e. */
  private val eRestore: Set[String] = Set("use", "store", "share", "provide",
    "receive", "release", "exchange", "disclose", "lease", "acquire",
    "oblige", "enable", "authorize", "continue", "combine", "serve",
    "measure", "personalize", "improve", "customize", "analyze", "utilize",
    "save", "preserve", "require", "ensure", "secure", "enhance", "manage",
    "delete", "update", "give", "make", "notice", "purchase", "device",
    "operate", "administer")

  def lemma(word: String): String = {
    val w = word.toLowerCase
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
          else if (base.length > 2 && base(base.length - 1) == base(base.length - 2)) base.dropRight(1)
          else base
        } else if (w.endsWith("ed") && w.length > 4) {
          val base = w.dropRight(2)
          if (eRestore.contains(base + "e")) base + "e"
          else if (base.length > 2 && base(base.length - 1) == base(base.length - 2) &&
            !base.endsWith("ss") && !base.endsWith("ll")) base.dropRight(1)
          else base
        } else if (w.endsWith("s") && !w.endsWith("ss") && !w.endsWith("us") && !w.endsWith("is")) {
          w.dropRight(1)
        } else w
    }
  }

  /** Multi-word DATA phrases for dictionary NER (lemma-sequence keyed).
    * Longest match wins. Mirrors the *capability* of the reference's
    * transformer NER over phrase_map vocabulary. */
  val dataPhrases: Set[Vector[String]] = Set(
    "email address", "email", "ip address", "mac address",
    "location", "geolocation", "precise location", "precise geolocation",
    "gps location", "coarse location", "approximate location",
    "location data", "location information",
    "device identifier", "device id", "advertising identifier",
    "advertising id", "identifier", "unique identifier", "cookie",
    "cookie data", "pixel tag", "web beacon",
    "phone number", "telephone number", "mobile number", "fax number",
    "postal address", "mailing address", "home address", "street address",
    "zip code", "postal code",
    "name", "first name", "last name", "full name", "user name", "username",
    "date of birth", "birth date", "birthday", "age", "gender",
    "browsing history", "search history", "browser history", "search query",
    "usage information", "usage data", "usage statistic",
    "payment information", "payment data", "payment detail",
    "credit card number", "debit card number", "credit card information",
    "card number", "bank account number", "billing information",
    "social security number", "ssn", "passport number",
    "driver license number", "government identifier",
    "biometric information", "biometric data", "fingerprint", "voiceprint",
    "face scan", "facial recognition data",
    "contact information", "contact detail", "contact list", "address book",
    "account credential", "password", "login credential",
    "health information", "health data", "medical information",
    "purchase history", "transaction history", "order history",
    "device information", "device data", "hardware model", "device model",
    "os version", "operating system version", "operating system",
    "browser type", "browser version", "user agent",
    "personal information", "personal data", "personally identifiable information",
    "demographic information", "demographic data",
    "crash report", "crash log", "log data", "server log", "diagnostic data",
    "photo", "photograph", "picture", "video", "audio recording",
    "voice recording", "audio data", "profile picture",
    "information", "data", "datum", "detail", "record",
    "race", "ethnicity", "religion", "political opinion",
    "sexual orientation", "marital status", "income", "occupation",
    "education", "employment information", "interest", "preference",
    "language preference", "time zone", "wifi information",
    "sensor data", "calendar information", "sms message", "text message",
    "call log", "app usage", "installed app", "serial number",
    "imei", "android id", "advertising tag", "referral url", "page view",
    "click data", "device fingerprint").map(_.split(' ').toVector)

  /** Multi-word ACTOR phrases for dictionary NER. */
  val actorPhrases: Set[Vector[String]] = Set(
    "advertiser", "advertising network", "ad network", "advertising partner",
    "advertising company", "ad partner",
    "analytics provider", "analytics company", "analytics service",
    "analytics partner", "measurement provider",
    "service provider", "third party service provider", "vendor", "supplier",
    "business partner", "partner", "affiliate", "subsidiary", "parent company",
    "third party", "third parties", "external party",
    "social media platform", "social network", "social media company",
    "social media site",
    "government", "government agency", "law enforcement",
    "law enforcement agency", "regulator", "authority", "court",
    "payment processor", "payment provider", "hosting provider",
    "cloud provider", "email service provider", "marketing partner",
    "research partner", "insurance company", "credit bureau", "data broker",
    "content provider", "platform provider", "app store", "operator",
    "carrier", "mobile carrier", "company", "organization", "entity",
    "user", "visitor", "customer", "consumer", "member", "subscriber",
    "child", "minor", "parent", "developer", "employee", "agent",
    "contractor", "successor", "acquirer", "merchant", "publisher",
    "website", "application", "app", "site", "service",
    "google", "facebook", "meta", "twitter", "amazon", "apple", "microsoft",
    "google analytics", "google ads", "facebook pixel", "firebase",
    "crashlytics", "adjust", "appsflyer", "unity", "admob", "doubleclick",
    "instagram", "youtube", "linkedin", "tiktok", "snapchat", "pinterest",
    "salesforce", "adobe", "oracle", "mailchimp", "stripe", "paypal",
    "zendesk", "hubspot", "cloudflare", "mixpanel", "hotjar",
    "flurry", "branch", "braze", "onesignal").map(_.split(' ').toVector)

  /** Known company entities with aliases + registered domains — a tiny
    * in-repo analogue of the reference's entity_info.json
    * (graph_utils.py:43-73); used by entity normalization + domain joins. */
  val entityInfo: Map[String, (Set[String], Set[String])] = Map(
    // canonical -> (aliases(lowercase), domains)
    "google" -> (Set("google", "google llc", "google inc", "alphabet",
      "google analytics", "google ads", "admob", "doubleclick", "firebase",
      "crashlytics", "youtube"), Set("google.com", "googleapis.com",
      "doubleclick.net", "firebase.com", "youtube.com", "admob.com")),
    "facebook" -> (Set("facebook", "meta", "facebook inc", "meta platforms",
      "facebook pixel", "instagram"), Set("facebook.com", "fb.com",
      "instagram.com", "meta.com")),
    "amazon" -> (Set("amazon", "amazon.com", "aws", "amazon web services"),
      Set("amazon.com", "aws.amazon.com")),
    "apple" -> (Set("apple", "apple inc"), Set("apple.com")),
    "microsoft" -> (Set("microsoft", "microsoft corporation", "linkedin"),
      Set("microsoft.com", "linkedin.com")),
    "twitter" -> (Set("twitter", "twitter inc", "x corp"), Set("twitter.com", "x.com")),
    "adjust" -> (Set("adjust", "adjust gmbh"), Set("adjust.com")),
    "appsflyer" -> (Set("appsflyer"), Set("appsflyer.com")),
    "unity" -> (Set("unity", "unity ads", "unity technologies"), Set("unity3d.com")),
    "stripe" -> (Set("stripe"), Set("stripe.com")),
    "paypal" -> (Set("paypal"), Set("paypal.com")),
    "tiktok" -> (Set("tiktok", "bytedance"), Set("tiktok.com")),
    "snapchat" -> (Set("snapchat", "snap inc"), Set("snapchat.com")),
    "pinterest" -> (Set("pinterest"), Set("pinterest.com")),
    "adobe" -> (Set("adobe", "adobe analytics", "omniture"), Set("adobe.com")),
    "salesforce" -> (Set("salesforce"), Set("salesforce.com")),
    "mixpanel" -> (Set("mixpanel"), Set("mixpanel.com")),
    "hotjar" -> (Set("hotjar"), Set("hotjar.com")),
    "flurry" -> (Set("flurry"), Set("flurry.com")),
    "onesignal" -> (Set("onesignal"), Set("onesignal.com")))

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
