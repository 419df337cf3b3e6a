package graft.llm

/** Prompt templates and framing (SURVEY.md §2.2 F7-F10 —
  * /root/reference/main.py:259-300, result_aggregator.py:111-219).
  *
  * Prompts are DATA (config strings), not code: the reference's only
  * user-extension surface is swapping these files (README.md:128-140).
  * Placeholder filling is literal substring replacement, not Python
  * `.format` — a custom prompt containing other `{…}` must not crash
  * (reference quirk F7, fixed).
  */
object Prompts {

  def fill(template: String, placeholder: String, value: String): String =
    template.replace("{" + placeholder + "}", value)

  /** Ensure a `{transcript}` placeholder exists, appending one if missing —
    * /root/reference/main.py:274-277. */
  def ensureTranscriptPlaceholder(template: String): String =
    if (template.contains("{transcript}")) template
    else template + "\n\n{transcript}"

  val defaultMapPrompt: String =
    """Please summarize the following transcript segment:
      |
      |{transcript}
      |
      |Provide:
      |
      |### 1. Concise Summary
      |[3-5 sentence overview of the main content]
      |
      |### 2. Key Topics Discussed
      |[Bullet list of main topics]
      |
      |### 3. Notable Quotes or Statements
      |[2-3 important or representative quotes]""".stripMargin

  /** F10: metadata block (/root/reference/result_aggregator.py:131-135).
    * Seq of pairs, not Map — insertion order is rendered order. */
  def metadataBlock(metadata: Seq[(String, String)]): String =
    if (metadata.isEmpty) ""
    else
      "Additional Information:\n" +
        metadata.map { case (k, v) => s"- $k: $v\n" }.mkString

  /** F9: SUMMARY i framing (/root/reference/result_aggregator.py:138-143). */
  def frameSummaries(summaries: Seq[String]): String = {
    val bar = "=" * 40
    summaries.zipWithIndex.map { case (s, i) =>
      s"SUMMARY ${i + 1}:\n$bar\n$s\n$bar\n\n"
    }.mkString
  }

  /** F8: time-position prefix (/root/reference/result_aggregator.py:82-91). */
  def positionPrefix(startFmt: String, endFmt: String, summary: String): String =
    s"[Time: $startFmt - $endFmt]\n$summary"

  /** F11: defensive greeting scrubber
    * (/root/reference/test_direct_aggregation.py:146-167): when the reply
    * opens with a greeting, drop leading lines until the first non-empty
    * line that is not itself a greeting. A reply that never produces such
    * a line is returned unchanged (the reference only prints the cleaned
    * lines when non-empty). */
  def scrubGreeting(summary: String): String = {
    val lower = summary.toLowerCase
    if (!lower.startsWith("hello") && !lower.startsWith("hi")) summary
    else {
      val greetings = Seq("hello", "hi", "hey")
      val lines = summary.split("\n", -1)
      val kept = lines.dropWhile { line =>
        line.trim.isEmpty ||
        greetings.exists(g => line.toLowerCase.startsWith(g))
      }
      if (kept.isEmpty) summary else kept.mkString("\n")
    }
  }

  val reduceSystemDefault: String =
    """You are a professional transcript summarizer. Your ONLY job is to create a structured summary that
      |combines information from multiple transcript segment summaries.
      |
      |IMPORTANT RULES:
      |1. DO NOT include any greeting or introduction
      |2. DO NOT ask how you can help
      |3. ONLY produce the summary in the requested format
      |4. START your response with "# Transcript Summary"
      |5. The summary MUST ONLY contain information from the provided summaries
      |6. DO NOT make up information not contained in the summaries
      |7. DO NOT discuss general impacts of technology - stay focused on the transcript content""".stripMargin

  val reduceSystemVideoEditor: String =
    """You are a professional transcript summarizer specializing in video editing formats. Your job is to create a
      |structured summary that combines information from multiple transcript segment summaries.
      |
      |IMPORTANT RULES:
      |1. DO NOT include any greeting or introduction
      |2. DO NOT ask how you can help
      |3. Follow EXACTLY the format specified in the user prompt
      |4. Preserve ALL timestamps in [HH:MM:SS] format
      |5. The summary MUST ONLY contain information from the provided summaries
      |6. DO NOT make up information not contained in the summaries
      |7. DO NOT discuss general impacts of technology - stay focused on the transcript content""".stripMargin

  def reduceUserDefault(metadataStr: String, formattedSummaries: String): String =
    s"""I need you to combine multiple transcript summaries into a single coherent summary.
       |
       |$metadataStr
       |
       |Here are the summaries from different segments of the transcript:
       |
       |$formattedSummaries
       |
       |Your summary must accurately reflect ONLY the content in these summaries.
       |
       |Format your response with these exact headings:
       |
       |# Transcript Summary
       |
       |## Overview
       |[2-3 sentence high-level description of what the transcript contains]
       |
       |## Main Topics
       |[Bullet list of key themes and topics discussed]
       |
       |## Key Points
       |[Bullet list of important details and takeaways]
       |
       |## Notable Quotes
       |[Direct quotes from the transcript that were mentioned in the summaries]""".stripMargin

  /** The "video editor" routing marker: a custom reduce template is honored
    * only when it carries this substring and a `{summaries}` placeholder
    * (/root/reference/result_aggregator.py:146,178-190). The engine gives
    * every template a real `{summaries}` placeholder; the marker only
    * selects the system prompt. */
  val videoEditorMarker = "TIMELINE SUMMARY"
}
