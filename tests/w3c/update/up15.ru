PREFIX ex: <http://ex/>
WITH ex:g1 DELETE { ?s ex:v ?n } INSERT { ?s ex:v2 ?n } WHERE { ?s ex:v ?n }
