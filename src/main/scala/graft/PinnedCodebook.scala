package graft

/** A FITTED product-quantization codebook pinned as a constant.
  *
  * A live seeded k-means|| fit is deterministic and
  * engine-reproducible but not practically SQL-replayable, so its
  * codebook cannot be re-derived by the DuckDB oracle. This constant
  * closes that gap from the other side: the codebook is a FIT
  * ARTIFACT — an input to the ADC scan, exactly like a model
  * checkpoint — so the registered `ann_pq_fitted_topk` row feeds
  * the SAME literal entries to both engines (Spark via
  * `Pq.pqTopK(codebooks = Some(...))`, DuckDB via a VALUES table
  * generated from this constant), making the fitted-codebook ADC
  * top-k fully hash-checked. Fit quality itself is separately pinned
  * by `ann_pq_fitted_bounds` (fitted distortion <= sample, an
  * invariant of construction).
  *
  * Provenance: `Pq.kmeansCodebook(embeddings@sf0.01, m = 4,
  * ksub = 16)` (seeded k-means||, exact-integer Lloyd; see
  * operators/KMeans.scala). Regenerate with the same call and paste —
  * the row stays green across testdata refreshes either way, because
  * the codebook is an input constant, not a derivation the oracle
  * replays.
  *
  * Shape: [m = 4 subspaces][ksub = 16 entries][16 dims], quantized
  * integers (Similarity.QuantScale).
  */
object PinnedCodebook {
  val FittedPq: Array[Array[Array[Long]]] = Array(
      Array(
        Array(-136L,39L,-39L,42L,27L,117L,-13L,-11L,13L,25L,114L,41L,-42L,-24L,88L,-12L),
        Array(-21L,-4L,3L,13L,43L,-15L,22L,7L,122L,-35L,-66L,-31L,-3L,-98L,102L,-91L),
        Array(-7L,-13L,133L,11L,-54L,8L,-58L,39L,48L,122L,8L,-114L,104L,-28L,-61L,6L),
        Array(88L,10L,-78L,-26L,49L,-5L,-42L,116L,-13L,44L,-23L,45L,2L,33L,-151L,162L),
        Array(35L,-3L,-65L,4L,10L,-12L,71L,-126L,-9L,-58L,33L,45L,107L,85L,13L,-99L),
        Array(75L,-53L,40L,-10L,18L,-44L,-74L,-180L,3L,-97L,51L,-5L,-6L,2L,-127L,66L),
        Array(107L,-37L,-7L,-35L,73L,-98L,-72L,101L,20L,-42L,104L,-85L,17L,-27L,80L,56L),
        Array(-21L,53L,-171L,-51L,-35L,28L,47L,81L,-5L,-165L,-31L,-43L,-28L,112L,-9L,35L),
        Array(-22L,-5L,-73L,40L,-139L,-3L,-129L,-60L,0L,-64L,-46L,9L,1L,51L,-14L,4L),
        Array(38L,-61L,11L,-8L,-76L,65L,8L,80L,-103L,-48L,56L,17L,-72L,-60L,-103L,-129L),
        Array(5L,-33L,42L,12L,-39L,-24L,142L,64L,-44L,99L,102L,25L,-73L,69L,40L,42L),
        Array(-65L,131L,101L,-111L,-23L,76L,25L,-49L,59L,78L,-114L,90L,-100L,-41L,-65L,-75L),
        Array(-14L,41L,62L,100L,4L,-102L,57L,78L,-104L,100L,-137L,50L,12L,67L,25L,23L),
        Array(28L,127L,72L,12L,44L,45L,-118L,21L,-21L,-94L,9L,-29L,-20L,-148L,-13L,108L),
        Array(-34L,-113L,58L,-29L,99L,64L,-151L,15L,-5L,65L,-50L,129L,28L,-77L,41L,16L),
        Array(-35L,0L,9L,-76L,138L,40L,25L,-71L,7L,48L,2L,-57L,-15L,120L,47L,47L)),
      Array(
        Array(50L,-46L,-47L,-51L,18L,-50L,55L,-41L,88L,190L,51L,34L,-81L,-22L,-21L,74L),
        Array(54L,7L,-42L,0L,-70L,-15L,-21L,-76L,26L,-19L,-63L,103L,29L,-118L,-14L,-45L),
        Array(77L,85L,24L,-94L,1L,37L,45L,109L,-20L,-108L,23L,22L,28L,-82L,60L,-16L),
        Array(-70L,-55L,32L,13L,14L,-98L,-56L,-2L,-97L,-36L,3L,-51L,50L,-26L,-4L,-187L),
        Array(77L,-4L,-45L,71L,53L,46L,-135L,32L,-38L,-46L,36L,16L,55L,-5L,-133L,32L),
        Array(-13L,0L,9L,-22L,30L,-74L,150L,97L,102L,-30L,-2L,118L,-87L,-39L,-279L,-87L),
        Array(128L,-54L,-29L,-28L,-106L,-57L,10L,23L,45L,45L,97L,-37L,87L,76L,52L,-61L),
        Array(-1L,-5L,27L,78L,43L,-108L,34L,-15L,-115L,64L,-42L,73L,29L,4L,-56L,129L),
        Array(-73L,-41L,117L,1L,5L,75L,-34L,53L,38L,112L,55L,-41L,18L,16L,-24L,10L),
        Array(0L,-6L,69L,97L,12L,133L,47L,8L,-71L,-32L,61L,95L,-115L,42L,70L,-14L),
        Array(-41L,154L,-7L,20L,-8L,-4L,49L,-101L,-99L,-86L,-19L,-67L,-8L,48L,1L,-40L),
        Array(26L,12L,59L,-40L,100L,25L,95L,-202L,82L,-13L,-55L,-28L,-32L,15L,-44L,66L),
        Array(8L,36L,18L,10L,15L,-40L,-41L,105L,102L,-41L,-70L,98L,27L,131L,93L,44L),
        Array(-38L,112L,-10L,-30L,-111L,56L,-35L,-19L,-3L,88L,-62L,-37L,-86L,-69L,71L,-23L),
        Array(-104L,-172L,-166L,-3L,-30L,5L,50L,-38L,12L,23L,-8L,-75L,-11L,-69L,102L,46L),
        Array(-22L,-110L,-158L,28L,40L,-7L,-46L,-4L,54L,77L,-52L,109L,-11L,122L,6L,-89L)),
      Array(
        Array(1L,-46L,-48L,96L,74L,49L,68L,107L,-36L,82L,-41L,33L,-129L,-100L,8L,-26L),
        Array(48L,181L,27L,31L,1L,5L,74L,2L,42L,-82L,32L,-60L,-14L,-75L,53L,-71L),
        Array(126L,-44L,-2L,22L,73L,8L,18L,19L,-14L,-69L,-100L,92L,-25L,69L,65L,2L),
        Array(105L,-67L,-22L,-184L,-73L,-7L,164L,-23L,-44L,36L,-28L,-47L,-29L,-6L,-53L,31L),
        Array(-42L,-57L,62L,57L,19L,30L,2L,71L,-53L,-23L,-53L,-120L,69L,-30L,-18L,110L),
        Array(23L,23L,-11L,-63L,-58L,160L,-63L,-64L,0L,-91L,9L,-25L,-131L,64L,-120L,-13L),
        Array(-15L,111L,38L,11L,-129L,70L,-11L,98L,-97L,-41L,158L,61L,15L,-2L,-94L,30L),
        Array(30L,-69L,-71L,-51L,27L,-120L,-87L,43L,116L,-23L,29L,5L,11L,-14L,-50L,27L),
        Array(-3L,-4L,26L,26L,-2L,38L,-192L,-64L,49L,-23L,-28L,92L,31L,30L,-53L,74L),
        Array(-102L,18L,81L,-129L,-26L,32L,20L,-33L,-72L,50L,-50L,16L,20L,17L,-44L,-126L),
        Array(1L,-29L,60L,51L,-63L,-37L,91L,-91L,-38L,-86L,106L,84L,-23L,32L,37L,46L),
        Array(-66L,-22L,-39L,20L,-34L,-76L,41L,-55L,95L,35L,-104L,-128L,-61L,57L,-1L,37L),
        Array(25L,89L,-4L,-78L,45L,-61L,-42L,-28L,-66L,165L,5L,-45L,78L,-37L,87L,78L),
        Array(18L,-125L,61L,-47L,9L,3L,-45L,29L,90L,41L,172L,-41L,-25L,-4L,107L,-110L),
        Array(35L,23L,-93L,138L,-48L,-2L,17L,-4L,-53L,-99L,-66L,20L,136L,12L,18L,-61L),
        Array(-68L,-18L,-40L,-51L,-20L,-87L,-112L,-93L,-26L,12L,72L,25L,-250L,101L,-49L,4L)),
      Array(
        Array(-50L,-5L,-140L,-23L,-44L,7L,4L,38L,4L,-116L,-86L,-53L,-53L,9L,29L,-37L),
        Array(-74L,-99L,-7L,54L,-120L,14L,97L,11L,18L,-32L,37L,85L,-70L,-11L,115L,-18L),
        Array(-113L,-141L,-18L,-1L,41L,18L,-64L,-26L,-1L,-29L,59L,-74L,86L,88L,-65L,25L),
        Array(-87L,31L,46L,63L,-5L,-31L,14L,64L,-27L,46L,-183L,-40L,78L,-79L,37L,8L),
        Array(-40L,-17L,-13L,29L,50L,89L,142L,-31L,-118L,44L,104L,-65L,-10L,-74L,83L,55L),
        Array(67L,-25L,20L,28L,41L,109L,-1L,2L,-57L,124L,-113L,83L,-119L,-34L,-31L,89L),
        Array(-36L,41L,7L,0L,-87L,59L,-1L,-131L,23L,91L,99L,-52L,-83L,43L,-75L,-85L),
        Array(11L,87L,43L,32L,-1L,-78L,-46L,-26L,137L,26L,-9L,84L,29L,-114L,14L,-8L),
        Array(88L,-70L,49L,57L,16L,35L,-32L,36L,-36L,-38L,-27L,15L,27L,6L,-6L,-166L),
        Array(67L,28L,-100L,-116L,38L,0L,23L,12L,24L,21L,-44L,-102L,55L,12L,-18L,28L),
        Array(-56L,-26L,86L,9L,129L,-60L,47L,-9L,-11L,-62L,41L,-4L,-94L,15L,-83L,-83L),
        Array(110L,-135L,110L,-43L,33L,11L,3L,54L,37L,28L,103L,9L,-7L,-15L,21L,137L),
        Array(47L,14L,2L,-3L,-13L,-131L,-41L,-74L,-50L,-40L,-16L,-70L,-8L,100L,59L,59L),
        Array(69L,150L,188L,-185L,-129L,45L,-167L,126L,123L,-122L,-73L,23L,22L,139L,131L,-56L),
        Array(29L,87L,71L,-56L,-14L,-49L,112L,154L,5L,47L,6L,-17L,123L,10L,-96L,-106L),
        Array(-7L,86L,16L,-54L,69L,41L,-101L,-119L,70L,-42L,44L,148L,40L,110L,-30L,-14L)))}
